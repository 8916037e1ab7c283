package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("id", "a", "b").cache()
  }

  test("native cosine is bit-identical to the HOF double fold") {
    val cmp = vecs.select(
      Similarity.cosine($"a", $"b").as("native"),
      Similarity.cosineHof($"a", $"b").as("hof"))
    assert(cmp.filter($"native" =!= $"hof").count() == 0)
  }

  test("native dot is bit-identical to the HOF double fold") {
    val cmp = vecs.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotHof($"a", $"b").as("hof"))
    assert(cmp.filter($"native" =!= $"hof").count() == 0)
  }

  test("self-similarity is 1.0; nulls propagate") {
    val r = vecs.limit(5).select(Similarity.cosine($"a", $"a").as("c")).as[Double].collect()
    assert(r.forall(c => math.abs(c - 1.0) < 1e-12))
    val n = vecs.limit(3).select(Similarity.cosine(lit(null).cast("array<float>"), $"b").as("c"))
      .filter($"c".isNull).count()
    assert(n == 3)
  }

  test("expression stays inside whole-stage codegen") {
    val df = vecs.select(Similarity.cosine($"a", $"b").as("c"))
    val hasCodegen = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasCodegen, s"no codegen span in:\n${df.queryExecution.executedPlan}")
    df.collect() // force the codegen path to actually compile + run
  }

  test("SQL registration via install and via extensions") {
    VectorExpressions.install(spark)
    vecs.createOrReplaceTempView("vexp")
    val r = spark.sql(
      "SELECT graft_cosine(a, b) AS c, graft_dot(a, b) AS d FROM vexp LIMIT 3")
      .as[(Double, Double)].collect()
    assert(r.length == 3 && r.forall(t => !t._1.isNaN && !t._2.isNaN))
  }

  test("double arrays accepted; mixed float/double accepted") {
    val d = vecs.limit(3).select(
      Similarity.cosine(
        expr("transform(a, x -> CAST(x AS DOUBLE))"),
        $"b").as("c")).as[Double].collect()
    assert(d.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("two instances in one projection still COMPILE (freshName locals)") {
    // regression: hardcoded `i`/`n`/`dot` locals collide when two copies
    // of the expression inline into one generated method (janino
    // "Redefinition of local variable") → the whole UnsafeProjection
    // silently fell back to interpreter. GenerateUnsafeProjection has no
    // fallback layer, so a collision throws here.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val b = BoundReference(1, ArrayType(DoubleType), nullable = true)
    val exprs = Seq(
      VectorExpressions.CosineSimilarity(a, b),
      VectorExpressions.CosineSimilarity(b, a),
      VectorExpressions.DotProduct(a, b),
      VectorExpressions.DotProduct(b, a))
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(exprs)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 0.0)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.6, 0.8)))
    val out = proj(row)
    assert(math.abs(out.getDouble(0) - 0.6) < 1e-12)
    assert(math.abs(out.getDouble(2) - 0.6) < 1e-12)
  }
}
