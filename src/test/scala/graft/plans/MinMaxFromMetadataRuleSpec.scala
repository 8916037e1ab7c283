package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation}
import org.apache.spark.sql.functions._

class MinMaxFromMetadataRuleSpec extends SparkSpec {
  import spark.implicits._

  private def rewritten(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    opt.collectFirst { case _: LocalRelation => () }.isDefined &&
      opt.collectFirst { case _: Aggregate => () }.isEmpty
  }

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-minmax").toString + "/t"
    Seq((1L, 7, "a"), (2L, -3, "b"), (3L, 99, "c"), (4L, 12, null))
      .toDF("id", "v", "s")
      .repartition(2) // several files → several footers folded
      .write.parquet(d)
    d
  }

  test("unfiltered min/max over parquet folds to a LocalRelation") {
    MinMaxFromMetadataRule.install(spark)
    val q = spark.read.parquet(dir)
      .agg(min("v").as("lo"), max("v").as("hi"),
        min("id").as("ilo"), max("id").as("ihi"), count(lit(1)).as("n"))
    assert(rewritten(q))
    assert(q.as[(Int, Int, Long, Long, Long)].head() == ((-3, 99, 1L, 4L, 4L)))
  }

  test("a filter disqualifies the rewrite, answer still correct") {
    MinMaxFromMetadataRule.install(spark)
    val q = spark.read.parquet(dir).filter(col("v") > 0).agg(min("v").as("lo"))
    assert(!rewritten(q))
    assert(q.as[Int].head() == 7)
  }

  test("string / non-integral aggregates are left to the scan") {
    MinMaxFromMetadataRule.install(spark)
    val q = spark.read.parquet(dir).agg(min("s").as("lo"))
    assert(!rewritten(q))
    assert(q.as[String].head() == "a") // nulls ignored, like the plain path
  }

  test("all-null column yields null min/max from metadata") {
    MinMaxFromMetadataRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-minmax-null").toString + "/t"
    Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])).toDF("id", "v")
      .write.parquet(d)
    val q = spark.read.parquet(d).agg(min("v").as("lo"), max("id").as("hi"))
    assert(rewritten(q))
    assert(q.as[(Option[Long], Long)].head() == ((None, 2L)))
  }

  test("folds over an unfiltered graft-temporal V2 snapshot") {
    MinMaxFromMetadataRule.install(spark)
    val p = java.nio.file.Files.createTempDirectory("graft-minmax-v2")
      .resolve("tbl").toString
    graft.sources.TemporalTable.write(
      Seq((1L, 5L), (2L, 9L)).toDF("node_key", "v"), p)
    graft.sources.TemporalTable.write(
      Seq((1L, 6L), (2L, 9L), (3L, -4L)).toDF("node_key", "v"), p)
    val q = spark.read.format("graft-temporal").load(p)
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
    assert(rewritten(q))
    // latest revision only — never the whole history
    assert(q.as[(Long, Long, Long)].head() == ((-4L, 9L, 3L)))
  }

  test("grouped aggregate is untouched") {
    MinMaxFromMetadataRule.install(spark)
    val q = spark.read.parquet(dir).groupBy("s").agg(min("v").as("lo"))
    assert(!rewritten(q))
    assert(q.count() == 4)
  }

  test("a partition column shadowed by a data column never folds from footers") {
    MinMaxFromMetadataRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-minmax-shadow")
      .toString + "/t"
    // the data FILE carries rev=99; the DIRECTORY says rev=7 — Spark's
    // read serves the partition value (7), so folding the footer's 99
    // would be a silently wrong answer
    Seq((1L, 99)).toDF("k", "rev").write.parquet(s"$d/rev=7")
    val df = spark.read.parquet(d)
    val q = df.agg(min("rev").as("lo"), max("rev").as("hi"))
    assert(!rewritten(q), "partition-column aggregate folded from a shadow")
    assert(q.as[(Int, Int)].head() == ((7, 7)))
    // non-partition columns over the same table still fold
    val q2 = df.agg(min("k").as("lo"))
    assert(rewritten(q2) && q2.as[Long].head() == 1L)
  }
}