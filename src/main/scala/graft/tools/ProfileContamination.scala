package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-11 forensics for the x_contamination bench regression (r10:
  * 0.555 s → 1.726 s with ext_cores 0.00 and the operator untouched).
  * Times the entry standalone, then replays the bench's own suite order
  * up to and through it, stamping JVM GC time per entry to separate
  * "the query got slower" from "the suite position got hotter".
  */
object ProfileContamination {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def execute(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    def dropLeftoverPins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    def timeOne(name: String, runs: Int): Unit = {
      execute(name) // warmup
      val times = (1 to runs).map { _ =>
        val g0 = gcMs(); val t0 = System.nanoTime()
        execute(name)
        val t = (System.nanoTime() - t0) / 1e9
        (t, gcMs() - g0)
      }
      dropLeftoverPins()
      val best = times.minBy(_._1)
      println(f"$name%-26s min=${best._1}%7.3f s  gc=${best._2}%5d ms  " +
        f"all=[${times.map(t => f"${t._1}%.3f").mkString(",")}]")
    }

    if (args.contains("standalone") || args.isEmpty) {
      println("=== standalone (fresh JVM, only this entry) ===")
      timeOne("x_contamination", 5)
    }
    if (args.contains("suite") || args.isEmpty) {
      println("=== bench suite order through x_contamination_scale ===")
      val order = Seq(
        "b_filter_count", "b_groupby", "b_sum", "b_avg", "b_minmax",
        "b_groupby_multi", "b_filter_groupby", "b_count_distinct", "b_compound_and",
        "q1_agg", "q3_topk", "q5_join", "q_window_rank",
        "t_history", "t_asof", "t_diff_snapshots", "t_window_tumbling",
        "d_exact_dedup", "d_minhash_pairs", "s_knn", "x_quality",
        "d_span_dedup", "x_contamination", "d_dedup_groups", "x_tfidf",
        "x_heavy_hitters", "x_contamination_scale")
      order.foreach { n => timeOne(n, if (n.startsWith("x_contamination")) 3 else 2) }
    }
    spark.stop()
  }
}
