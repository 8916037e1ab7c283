package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Valid-time interval algebra (SURVEY.md §2.3 interval/stab row, §2.10
  * valid-time index row; reference: persistent Relational-Interval-Tree,
  * bundles/sirix-core/src/main/java/io/sirix/index/interval/
  * RelationalIntervalTree.java:39).
  *
  * A naive interval-overlap join is a non-equi condition → broadcast
  * nested loop, quadratic at scale. The scalable plan bucketizes the time
  * axis: each interval explodes to the fixed-width buckets it spans, the
  * join becomes an equi-join on bucket (hash-shuffle, partitioned, AQE-
  * splittable), the exact overlap predicate filters inside the bucket and
  * a distinct drops multi-bucket duplicates. Bucket width trades
  * replication (long intervals × many buckets) against bucket occupancy —
  * pick it near the median interval length.
  */
object Intervals {

  private def overlaps(aFrom: Column, aTo: Column, bFrom: Column, bTo: Column): Column =
    aFrom < bTo && bFrom < aTo // half-open [from, to)

  /** Overlap join of two interval tables on [fromCol, toCol) (half-open).
    * Output: all column pairs (left prefixed `l_`, right `r_`) for every
    * overlapping pair. `bucketWidth` is in the axis' units. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  fromCol: String, toCol: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def bucketize(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
      renamed.withColumn("__bucket",
        explode(sequence(
          (col(s"$prefix$fromCol") / bucketWidth).cast("long"),
          // inclusive end bucket of the last contained instant (to is exclusive)
          ((col(s"$prefix$toCol") - 1) / bucketWidth).cast("long"))))
    }
    val l = bucketize(left, "l_")
    val r = bucketize(right, "r_")
    // An overlapping pair meets in every bucket both intervals span; keep
    // only the canonical match — the bucket containing max(l_from, r_from),
    // which overlap guarantees both spans contain. Exactly-once semantics
    // with NO distinct: duplicate input rows keep their multiplicity and
    // the extra dedup shuffle disappears.
    val canonicalBucket =
      (greatest(col(s"l_$fromCol"), col(s"r_$fromCol")) / bucketWidth).cast("long")
    l.join(r, Seq("__bucket"))
      .filter(overlaps(col(s"l_$fromCol"), col(s"l_$toCol"),
        col(s"r_$fromCol"), col(s"r_$toCol")))
      .filter(col("__bucket") === canonicalBucket)
      .drop("__bucket")
  }

  /** Stab query: intervals containing instant `ts` — a plain range
    * predicate (min/max file skipping applies; no join needed). */
  def stab(df: DataFrame, fromCol: String, toCol: String, ts: Column): DataFrame =
    df.filter(col(fromCol) <= ts && (col(toCol).isNull || col(toCol) > ts))

  /** Allen-style relation classifier for two intervals (columns). */
  def relation(aFrom: Column, aTo: Column, bFrom: Column, bTo: Column): Column =
    when(aTo <= bFrom, "before")
      .when(bTo <= aFrom, "after")
      .when(aFrom === bFrom && aTo === bTo, "equals")
      .when(aFrom >= bFrom && aTo <= bTo, "during")
      .when(bFrom >= aFrom && bTo <= aTo, "contains")
      .otherwise("overlaps")
}
