package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Optimizer-overhead probe for the metadata fold rules: time to produce
  * `optimizedPlan` for an aggregate over a SIDECAR-LESS table (every
  * driver table), rules uninstalled vs installed. The negative probe
  * cache must make the installed path indistinguishable from the bare
  * optimizer after the first query — the r6 VERDICT What's-wrong #3
  * "done" check, alongside the probe-counter spec. */
object ProfilePlanTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def sample(label: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        // fresh frame every run — a cached plan would measure nothing
        Tables.df(spark, d, "lineitem")
          .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
          .queryExecution.optimizedPlan
        (System.nanoTime() - t0) / 1e6
      }
      (1 to 5).foreach(_ => once()) // warm: analyzer caches, first probe
      val runs = (1 to 20).map(_ => once()).sorted
      println(f"$label%-22s med=${runs(10)}%7.2f ms  p90=${runs(17)}%7.2f ms  min=${runs.head}%7.2f ms")
    }

    sample("rules-uninstalled")
    graft.Graft.install(spark)
    graft.plans.AggFromStatsRule.install(spark)
    sample("rules-installed")
    spark.stop()
  }
}
