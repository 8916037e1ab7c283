package graft

import org.apache.spark.sql.functions._

/** The correctness-gate failure contract: a query that throws must leave a
  * loud `_error`-schema parquet in its output slot (driver records an
  * `err`/mismatch row), never a silent absence — the round-6 failure mode
  * where broken queries simply vanished from the correctness file. */
class VerifyDumpSpec extends SparkSpec {

  test("successful query writes its result parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft-vdump").toString
    Verify.dumpOne(spark, "unused", out, "good",
      (s, _) => s.range(3).select(col("id")))
    val r = spark.read.parquet(s"$out/good")
    assert(r.columns.toSeq == Seq("id") && r.count() == 3)
  }

  test("throwing query writes a one-row _error marker, not an absence") {
    val out = java.nio.file.Files.createTempDirectory("graft-vdump").toString
    Verify.dumpOne(spark, "unused", out, "broken",
      (_, _) => throw new IllegalStateException("synthetic breakage"))
    val r = spark.read.parquet(s"$out/broken")
    assert(r.columns.toSeq == Seq("_error"), "marker must use the _error schema")
    val msg = r.collect().map(_.getString(0)).mkString
    assert(r.count() == 1 && msg.contains("synthetic breakage"), msg)
  }

  test("analysis-time failure (lazy frame) also produces the marker") {
    val out = java.nio.file.Files.createTempDirectory("graft-vdump").toString
    // the frame BUILDS fine but fails at analysis/write — the common
    // breakage shape (round 6's type mismatches failed exactly here)
    Verify.dumpOne(spark, "unused", out, "lazy_broken",
      (s, _) => s.range(3).select(col("no_such_column")))
    val r = spark.read.parquet(s"$out/lazy_broken")
    assert(r.columns.toSeq == Seq("_error") && r.count() == 1)
  }
}
