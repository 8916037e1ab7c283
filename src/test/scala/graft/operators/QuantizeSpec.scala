package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.df(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("codes are dense int8 range and dimension-ordered") {
    val bounds = Quantize.fitBounds(emb, "embedding")
    val dim = emb.selectExpr("size(embedding)").as[Int].head()
    assert(bounds.count() == dim)
    val codes = Quantize.encode(emb, "vec_id", "embedding", bounds)
    val stats = codes.selectExpr(
      "min(array_min(codes))", "max(array_max(codes))", "min(size(codes))", "max(size(codes))")
      .as[(Long, Long, Int, Int)].head()
    assert(stats._1 >= 0L && stats._2 <= 255L)
    assert(stats._3 == dim && stats._4 == dim)
    // per-dimension bounds are hit: some vector codes 0 and some codes 255
    assert(stats._1 == 0L && stats._2 == 255L)
  }

  test("round-trip error is bounded by half a quantization step") {
    val bounds = Quantize.fitBounds(emb, "embedding")
    val codes = Quantize.encode(emb, "vec_id", "embedding", bounds)
    val decoded = Quantize.decode(codes, "vec_id", "codes", bounds)
    val joined = emb.join(decoded, "vec_id")
      .select(posexplode(arrays_zip(
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("x"),
        col("decoded").as("xhat"))))
      .select(col("pos"), col("col.x").as("x"), col("col.xhat").as("xhat"))
      .join(Quantize.fitBounds(emb, "embedding"), "pos")
      .select(abs(col("x") - col("xhat")).as("err"),
        ((col("mx") - col("mn")) / 255 / 2 + lit(1e-12)).as("half_step"))
    assert(joined.filter(col("err") > col("half_step")).count() == 0)
  }

  test("quantized cosine approximates full-precision cosine") {
    val bounds = Quantize.fitBounds(emb, "embedding")
    val codes = Quantize.encode(emb, "vec_id", "embedding", bounds)
    val decoded = Quantize.decode(codes, "vec_id", "codes", bounds)
    val q = emb.filter($"vec_id" === 0L)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS qv")
    val qd = decoded.filter($"vec_id" === 0L).selectExpr("decoded AS qv")
    val full = emb.crossJoin(broadcast(q))
      .select($"vec_id", Similarity.cosineHof(
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"), $"qv").as("sim"))
    val quant = decoded.crossJoin(broadcast(qd))
      .select($"vec_id", Similarity.cosineHof($"decoded", $"qv").as("sim_q"))
    val meanAbsErr = full.join(quant, "vec_id")
      .agg(avg(abs($"sim" - $"sim_q"))).as[Double].head()
    assert(meanAbsErr < 0.02, s"quantized cosine drifted: $meanAbsErr")
  }
}
