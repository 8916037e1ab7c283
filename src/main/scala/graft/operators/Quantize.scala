package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (int8-style) embedding quantization — the vector-compression step
  * of a large-scale similarity pipeline (4 bytes/dim float → 1 byte/dim
  * code cuts a 100 TB embedding store to a quarter; IVF+SQ is the standard
  * billion-scale ANN layout, and the reference's vector index stores raw
  * floats the same way our un-quantized path does).
  *
  * Bounds are per-dimension global min/max. The fit is a posexplode →
  * (dim)-keyed min/max aggregate: the explode is map-side, partial
  * aggregation folds each split to `dim` rows before the exchange, so the
  * shuffle carries dim × #splits rows regardless of table size. Encoding
  * re-explodes, broadcast-joins the (tiny, dim-row) bounds table on the
  * dimension ordinal, and rebuilds the code array with a bounded
  * `collect_list` (≤ dim elements per group — safe at any corpus scale).
  */
object Quantize {

  /** Per-dimension quantization bounds: (pos, mn, mx), pos 0-based. */
  def fitBounds(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "__x")))
      .select(col("pos"), col("__x").cast("double").as("x"))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))

  /** Quantize to integer codes 0..255: code = round((x−mn)/(mx−mn)·255),
    * clamped into [0, 255] so values OUTSIDE the fitted bounds (encoding a
    * new corpus against frozen bounds) still honor the int8 contract;
    * constant dimensions code to 0. Output: (idCol, `codes` array<long>)
    * in dimension order; rows with a null/empty vector keep a null `codes`
    * (never silently dropped).
    *
    * Malformed inputs surface, never corrupt: a NULL vector ELEMENT keeps
    * a null code slot (Spark's greatest/least skip nulls — the clamp
    * would otherwise fabricate code 0, the dimension minimum, for a value
    * that was never observed), and a vector LONGER than the fitted bounds
    * keeps null slots for the unbounded dimensions (a left join — the
    * inner join silently truncated such vectors). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             bounds: DataFrame): DataFrame = {
    val id = col(idCol)
    val encoded = df.select(id, posexplode(col(vecCol)).as(Seq("pos", "__x")))
      .join(broadcast(bounds), Seq("pos"), "left")
      .select(id, col("pos"),
        when(col("__x").isNull || col("mn").isNull, lit(null).cast("long"))
          .when(col("mx") === col("mn"), 0L)
          .otherwise(least(greatest(
            round((col("__x").cast("double") - col("mn"))
              / (col("mx") - col("mn")) * 255).cast("long"), lit(0L)), lit(255L)))
          .as("code"))
      .groupBy(id)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("code")))),
        s => s.getField("code")).as("codes"))
    df.select(id).join(encoded, Seq(idCol), "left")
  }

  /** Reconstruct doubles from codes: x̂ = mn + code·(mx−mn)/255. Rows with
    * null/empty codes keep a null `decoded`. */
  def decode(df: DataFrame, idCol: String, codesCol: String,
             bounds: DataFrame): DataFrame = {
    val id = col(idCol)
    val decoded = df.select(id, posexplode(col(codesCol)).as(Seq("pos", "code")))
      .join(broadcast(bounds), "pos")
      .select(id, col("pos"),
        (col("mn") + col("code").cast("double") * (col("mx") - col("mn")) / 255)
          .as("xhat"))
      .groupBy(id)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("xhat")))),
        s => s.getField("xhat")).as("decoded"))
    df.select(id).join(decoded, Seq(idCol), "left")
  }
}
