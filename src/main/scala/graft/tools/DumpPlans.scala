package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Write `explain("formatted")` for the given declared queries to
  * `plans/<tag>/<name>_<suffix>.txt` — the optimization-round evidence
  * files (judge checks plan claims against these).
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> [names...]
  * (no names = the bench headline set). */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r16")
    val suffix = args.drop(1).headOption.getOrElse("before")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.length > 2) args.drop(2).toSeq else Seq(
      "b_filter_count", "b_groupby", "b_sum", "b_avg", "b_minmax",
      "b_groupby_multi", "b_filter_groupby", "b_count_distinct",
      "b_compound_and", "q1_agg", "q3_topk", "q5_join", "q_window_rank",
      "t_history", "t_asof", "t_diff_snapshots", "t_window_tumbling",
      "d_exact_dedup", "d_minhash_pairs", "s_knn", "x_quality",
      "d_span_dedup", "x_contamination", "d_dedup_groups", "x_tfidf",
      "x_heavy_hitters", "x_contamination_scale", "d_cdc_share")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, d).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"wrote $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"$n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
