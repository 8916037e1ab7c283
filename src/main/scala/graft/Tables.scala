package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Read one table. `events.ts` must surface as epoch-nanoseconds LongType
    * regardless of the file's physical parquet encoding — the driver has
    * shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) eras of the same
    * table, and (like the reference, which reconstructs any stored revision
    * uniformly whatever its on-disk version —
    * sirix-core io/sirix/settings/VersioningType.java) the reader owns the
    * normalization, not the query layer:
    *
    *   - TIMESTAMP(NANOS) files: Spark only reads these under the
    *     nanosAsLong legacy conf, which yields epoch-ns LongType directly.
    *   - TIMESTAMP(MICROS) files: surface as TimestampType/TimestampNTZType;
    *     convert via `unix_micros * 1000`. Session timezone is UTC at every
    *     entry point (Verify/Bench/SparkSpec), so the NTZ→instant cast is
    *     exactly the UTC interpretation DuckDB's `epoch_ns` oracle uses.
    *
    * Either way every temporal query sees one integral ns axis.
    */
  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // NOTE: session-global on purpose — the events table shipped as
      // TIMESTAMP(NANOS) in early testdata eras and every read of it in
      // this session (queries, verify, bench) must decode identically.
      // This is a TEST-HARNESS loader, not library API; library readers
      // never touch this conf.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      raw.schema("ts").dataType match {
        case LongType => raw
        case TimestampType | TimestampNTZType =>
          raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported physical type $other (expected ns-long or timestamp)")
      }
    } else spark.read.parquet(path(dir, name))
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
