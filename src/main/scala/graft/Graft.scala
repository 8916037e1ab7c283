package graft

import org.apache.spark.sql.SparkSession

/** One-call library installation on an existing session: registers the
  * native SQL functions (graft_cosine / graft_dot) and the
  * count-from-metadata optimizer rule. New sessions can instead set
  * `spark.sql.extensions=graft.functions.GraftExtensions`, which injects
  * the same pieces at session build time.
  */
object Graft {
  def install(spark: SparkSession): Unit = {
    functions.VectorExpressions.install(spark)
    plans.CountFromMetadataRule.install(spark)
    // before DictAggRule: a count-distinct a sidecar can serve whole
    // should fold outright rather than be rewritten onto dict codes
    plans.AggFromStatsRule.install(spark)
    plans.DictAggRule.install(spark)
    plans.MinMaxFromMetadataRule.install(spark)
  }
}
