package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump formatted physical plans for the headline queries (plan audit). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_topk", "q5_join", "t_asof", "s_knn", "b_filter_count")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    // the two plan-rewrite demos: stab pruning + single-plan change feed
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.plans.ValidTimeStabRule.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft-audit")
    val ivPath = tmp.resolve("iv").toString
    graft.operators.Intervals.writeIndexed(
      (0 until 400).map(i => (i.toLong, (i * 53L) % 19000, (i * 53L) % 19000 + 200))
        .toDF("id", "vf", "vt"), ivPath, "vf", "vt", 16L)
    val stab = graft.operators.Intervals.readIndexed(spark, ivPath)
      .filter(col("vf") <= 9973L && col("vt") > 9973L)
    println("\n========== valid-time stab (fork-pruned file listing) ==========")
    println(stab.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    stab.collect()
    val scan = stab.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.head
    println(s"numFiles read: ${scan.metrics("numFiles").value} of ${stab.inputFiles.length} total")

    val feedPath = tmp.resolve("feed").toString
    (1 to 10).foreach { r =>
      graft.sources.TemporalTable.write(
        Seq((1L, r.toDouble), (r.toLong + 100, 0.0)).toDF("node_key", "price"), feedPath)
    }
    println("\n========== revisionFeed (single-plan change feed, 10 revisions) ==========")
    println(graft.streaming.ChangeFeed.revisionFeed(spark, feedPath)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))

    // dictionary-surrogate rewrite: the group-by keys on int32 codes and
    // the scan's ReadSchema carries no string column
    graft.plans.DictAggRule.install(spark)
    val dictPath = tmp.resolve("dict").toString
    graft.operators.Dict.writeEncoded(
      graft.Tables.df(spark, d, "documents").select("doc_id", "lang", "source", "n_chars"),
      Seq("lang", "source"), dictPath)
    val dictAgg = spark.read.parquet(dictPath)
      .filter(col("source") === "src3")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    println("\n========== dict-surrogate aggregate (no string column scanned) ==========")
    println(dictAgg.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    // metadata-only min/max: the whole aggregate folds to a LocalRelation
    graft.plans.MinMaxFromMetadataRule.install(spark)
    val mm = spark.read.parquet(dictPath).agg(
      min("doc_id").as("lo"), max("doc_id").as("hi"), count(lit(1)).as("n"))
    println("\n========== metadata-only min/max (zero-task LocalRelation) ==========")
    println(mm.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
