package graft.plans

import graft.SparkSpec
import graft.sources.{ProjectionIndex, TemporalTable}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import java.nio.file.Files

class CountFromMetadataRuleSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val p = Files.createTempDirectory("graft-cfm").resolve("tbl").toString
    TemporalTable.write((1L to 100L).map(i => (i, i * 2.0)).toDF("node_key", "price"), p)
    TemporalTable.write((1L to 150L).map(i => (i, i * 3.0)).toDF("node_key", "price"), p)
    p
  }

  test("count(*) over a temporal scan folds to a metadata-only LocalRelation") {
    CountFromMetadataRule.install(spark)
    val p = mkTable()
    val df = spark.read.format("graft-temporal").load(p).groupBy().count()
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.isInstanceOf[LocalRelation] ||
      optimized.collectLeaves().forall(_.isInstanceOf[LocalRelation]),
      s"expected metadata-only plan, got:\n$optimized")
    assert(df.as[Long].head() == 150L) // latest revision
    val all = spark.read.format("graft-temporal").option("allRevisions", "true")
      .load(p).groupBy().count()
    assert(all.as[Long].head() == 250L)
    assert(all.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation]))
  }

  test("projection copies under _proj do not inflate the metadata count") {
    CountFromMetadataRule.install(spark)
    val p = mkTable()
    ProjectionIndex.create(spark, p, "k", Seq("node_key"))
    val all = spark.read.format("graft-temporal").option("allRevisions", "true")
      .load(p).groupBy().count()
    assert(all.as[Long].head() == 250L) // not doubled by _proj copies
  }

  test("count(NULL) is not rewritten to the row count") {
    CountFromMetadataRule.install(spark)
    val p = mkTable()
    val n = spark.read.format("graft-temporal").load(p)
      .selectExpr("count(null) AS c").as[Long].head()
    assert(n == 0L)
  }

  test("filtered and grouped counts are NOT rewritten (scan still answers)") {
    CountFromMetadataRule.install(spark)
    val p = mkTable()
    val filtered = spark.read.format("graft-temporal").load(p)
      .filter($"price" > 300.0).groupBy().count()
    assert(!filtered.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation]))
    assert(filtered.as[Long].head() == 50L) // prices 303..450 for keys 101..150
    val grouped = spark.read.format("graft-temporal").load(p)
      .groupBy($"node_key" % 2).count()
    assert(!grouped.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation]))
  }
}
