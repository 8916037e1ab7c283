package graft.plans

import graft.SparkSpec
import graft.sources.StatsSidecar
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation}
import org.apache.spark.sql.functions._

class AggFromStatsRuleSpec extends SparkSpec {
  import spark.implicits._

  private def rewritten(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    opt.collectFirst { case _: LocalRelation => () }.isDefined &&
      opt.collectFirst { case _: Aggregate => () }.isEmpty
  }

  // v: ints with a null; s: low-cardinality string; d: doubles (no sum stat)
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats").toString + "/t"
    Seq((1L, Some(7), "a", 0.5), (2L, Some(-3), "b", 1.5),
        (3L, Some(99), "a", 2.5), (4L, None, "c", 3.5))
      .toDF("id", "v", "s", "d")
      .repartition(2)
      .write.parquet(d)
    StatsSidecar.write(spark, d, ndvCols = Seq("s", "v"))
    d
  }

  test("unfiltered sum/avg/count/min/max/countDistinct folds to a LocalRelation") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(dir).agg(
      sum("v").as("sv"), avg("v").as("av"), count(lit(1)).as("n"),
      count(col("v")).as("nv"), min("v").as("lo"), max("v").as("hi"),
      countDistinct(col("s")).as("ds"), sum("id").as("si"))
    assert(rewritten(q))
    assert(q.as[(Long, Double, Long, Long, Int, Int, Long, Long)].head() ==
      ((103L, 103.0 / 3, 4L, 3L, -3, 99, 3L, 10L)))
  }

  test("a filter disqualifies the fold, answer still correct") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(dir).filter(col("v") > 0).agg(sum("v").as("sv"))
    assert(!rewritten(q))
    assert(q.as[Long].head() == 106L)
  }

  test("grouped aggregate and unsupported aggregates are untouched") {
    AggFromStatsRule.install(spark)
    val g = spark.read.parquet(dir).groupBy("s").agg(sum("v").as("sv"))
    assert(!rewritten(g))
    // double sum: no sidecar statistic (order-dependent FP) → scan
    val q = spark.read.parquet(dir).agg(sum("d").as("sd"))
    assert(!rewritten(q))
    assert(q.as[Double].head() == 8.0)
  }

  test("ndv not recorded for a column → no fold") {
    AggFromStatsRule.install(spark)
    // d (double) got no ndv at write time (not requested)
    val q = spark.read.parquet(dir).agg(countDistinct(col("d")).as("dd"))
    assert(!rewritten(q))
    assert(q.as[Long].head() == 4L)
  }

  test("stale sidecar (appended file) disables the fold; fresh rewrite re-enables") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-stale").toString + "/t"
    Seq((1L, 10), (2L, 20)).toDF("id", "v").write.parquet(d)
    StatsSidecar.write(spark, d)
    assert(rewritten(spark.read.parquet(d).agg(sum("v").as("sv"))))
    // append behind the sidecar's back
    Seq((3L, 30)).toDF("id", "v").write.mode("append").parquet(d)
    val q = spark.read.parquet(d).agg(sum("v").as("sv"))
    assert(!rewritten(q)) // fingerprint mismatch → scan
    assert(q.as[Long].head() == 60L)
    // rewriting the sidecar restores the fold with the right answer
    StatsSidecar.write(spark, d)
    val q2 = spark.read.parquet(d).agg(sum("v").as("sv"))
    assert(rewritten(q2))
    assert(q2.as[Long].head() == 60L)
  }

  test("all-null column folds to null sum/avg and zero count") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-null").toString + "/t"
    Seq((1L, Option.empty[Int]), (2L, Option.empty[Int])).toDF("id", "v")
      .write.parquet(d)
    StatsSidecar.write(spark, d)
    val q = spark.read.parquet(d).agg(
      sum("v").as("sv"), avg("v").as("av"), count(col("v")).as("nv"))
    assert(rewritten(q))
    assert(q.as[(Option[Long], Option[Double], Long)].head() == ((None, None, 0L)))
  }

  test("folds an unfiltered graft-temporal V2 snapshot carrying a sidecar") {
    AggFromStatsRule.install(spark)
    val p = java.nio.file.Files.createTempDirectory("graft-aggstats-v2")
      .resolve("tbl").toString
    graft.sources.TemporalTable.write(
      Seq((1L, 5L), (2L, 9L)).toDF("node_key", "v"), p)
    graft.sources.TemporalTable.write(
      Seq((1L, 6L), (2L, 9L), (3L, -4L)).toDF("node_key", "v"), p)
    // sidecar for the latest revision's data dir
    StatsSidecar.write(spark, s"$p/rev=2")
    val q = spark.read.format("graft-temporal").load(p)
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(rewritten(q))
    assert(q.as[(Long, Long)].head() == ((11L, 3L)))
  }

  test("TemporalTable.write(withStats=true) folds snapshot and merges history") {
    AggFromStatsRule.install(spark)
    val p = java.nio.file.Files.createTempDirectory("graft-aggstats-ws")
      .resolve("tbl").toString
    graft.sources.TemporalTable.write(
      Seq((1L, 5L), (2L, 9L)).toDF("node_key", "v"), p, withStats = true)
    graft.sources.TemporalTable.write(
      Seq((1L, 6L), (2L, 9L), (3L, -4L)).toDF("node_key", "v"), p,
      withStats = true)
    val snap = spark.read.format("graft-temporal").load(p)
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(rewritten(snap))
    assert(snap.as[(Long, Long)].head() == ((11L, 3L)))
    // all-revisions frame: per-revision sidecars merge additively
    val hist = spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p)
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(hist.as[(Long, Long)].head() == ((25L, 5L)))
    // multi-root V1 read over both revision dirs: the additive merge
    // path, pinned as actually folding
    val multi = spark.read.parquet(s"$p/rev=1", s"$p/rev=2")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"),
        min("v").as("lo"), max("v").as("hi"))
    assert(rewritten(multi))
    assert(multi.as[(Long, Long, Long, Long)].head() == ((25L, 5L, -4L, 9L)))
  }
}
