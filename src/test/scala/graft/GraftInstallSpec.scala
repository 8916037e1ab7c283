package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftExtensions
import graft.plans.CountFromMetadataRule

class GraftInstallSpec extends SparkSpec {
  import spark.implicits._

  test("Graft.install registers SQL functions and the optimizer rule") {
    Graft.install(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("gv")
    val c = spark.sql("SELECT graft_cosine(a, b) AS c, graft_dot(a, b) AS d FROM gv")
      .as[(Double, Double)].head()
    assert(c == ((1.0, 1.0)))
    assert(spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[CountFromMetadataRule]))
    Graft.install(spark) // idempotent
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[CountFromMetadataRule]) == 1)
  }

  test("GraftExtensions injects the same pieces at session-build time") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graftbridge.GraftBridge.optimizerRules(ext, spark)
    assert(rules.exists(_.isInstanceOf[CountFromMetadataRule]))
  }
}
