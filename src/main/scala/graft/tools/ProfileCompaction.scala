package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-place history compaction on an AGED table: synthesize a 300-revision
  * table whose every commit arrived fragmented (8 files/revision — the
  * many-small-commits aftermath), compact the whole history in place, and
  * measure the read paths that pay for fragmentation: the full history
  * scan, the revision feed, and a pinned-revision read. Also reports the
  * file-count and byte deltas — at object-storage latencies the per-file
  * open cost is the dominant term the compaction removes. */
object ProfileCompaction {
  def main(args: Array[String]): Unit = {
    val nRevs = args.headOption.map(_.toInt).getOrElse(300)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-cprof").resolve("tbl").toString
    val filesPer = 8
    val keysPer = 400
    // synthesized at the storage layout (the Bench aged-table discipline):
    // data + commit-log entries with manifests, 8 files per revision
    val rows = spark.range(1, nRevs + 1L).select(col("id").cast("int").as("rev"))
      .crossJoin(spark.range(0, keysPer.toLong).toDF("node_key"))
      .withColumn("payload", xxhash64(col("node_key"), col("rev")))
    rows.repartition(nRevs * filesPer / 2, col("rev"), pmod(col("node_key"), lit(filesPer)))
      .write.partitionBy("rev").parquet(dir)
    val base = System.currentTimeMillis() - nRevs
    val fileLists = graft.sources.MetaIO.parallelMap((1 to nRevs).toSeq) { r =>
      r -> graft.sources.MetaIO.listFiles(s"$dir/rev=$r")
        .map { case (n, s) => s"$n|$s" }.mkString(";")
    }.toMap
    (1 to nRevs).foreach { r =>
      graft.sources.MetaIO.createNew(s"$dir/_commits/${"%08d".format(r)}.json",
        s"""{"revision":$r,"commitTsMs":${base + r},"author":"prof",""" +
          s""""message":"","files":"${fileLists(r)}"}""")
    }

    def countFiles(): Int = {
      val ovs = graft.sources.RevisionCompaction.overlays(dir)
      (1 to nRevs).map { r =>
        graft.sources.MetaIO.listFiles(
          graft.sources.RevisionCompaction.effectiveDir(dir, r, ovs)).size
      }.sum
    }
    def timed(label: String)(body: => Long): Double = {
      body // warmup
      val t0 = System.nanoTime()
      val n = body
      require(n > 0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.2fs")
      sec
    }

    println(s"before: ${countFiles()} data files across $nRevs revisions")
    timed("history scan (fragmented)")(
      graft.sources.TemporalTable.readAllRevisions(spark, dir).count())
    timed("revision feed (fragmented)")(
      graft.streaming.ChangeFeed.revisionFeed(spark, dir).count())
    timed("pinned-revision read (fragmented)")(
      graft.sources.TemporalTable.read(spark, dir, Some(7)).count())

    val t0 = System.nanoTime()
    val done = graft.sources.RevisionCompaction.compactHistory(spark, dir,
      targetFileBytes = 1L << 30, includeHead = true)
    println(f"compactHistory: ${done.size} revisions rewritten in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs")
    println(s"after: ${countFiles()} data files")

    timed("history scan (compacted)")(
      graft.sources.TemporalTable.readAllRevisions(spark, dir).count())
    timed("revision feed (compacted)")(
      graft.streaming.ChangeFeed.revisionFeed(spark, dir).count())
    timed("pinned-revision read (compacted)")(
      graft.sources.TemporalTable.read(spark, dir, Some(7)).count())
    spark.stop()
  }
}
