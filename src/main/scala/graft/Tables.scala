package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * Mirrors the reference's resource-open surface (`jn:doc` —
  * bundles/sirix-query/src/main/java/io/sirix/query/function/jn/io/Doc.java:31)
  * re-expressed as plain Spark parquet reads: the columnar scan, predicate
  * pushdown and column pruning Catalyst provides replace the reference's
  * PAX-region decoding fast path (SURVEY.md §1.4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Read one table. `events` carries parquet TIMESTAMP(NANOS) which Spark
    * only reads via the nanosAsLong legacy conf — its `ts` column surfaces
    * as epoch-nanoseconds LongType (we keep it integral; all temporal
    * queries work on the ns axis, which is also exactly what DuckDB's
    * `epoch_ns` yields for the oracle).
    */
  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, name))
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
