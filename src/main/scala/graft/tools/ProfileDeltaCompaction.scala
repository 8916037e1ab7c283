package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-place compaction on an AGED DELTA chain: commit `nRevs` revisions
  * through the delta write path with deliberately fragmented frames
  * (6-way repartition per commit — the many-small-commits aftermath),
  * then compact the whole chain in place and measure the reads that pay
  * for fragmentation: latest-revision reconstruction, the bounded
  * history frame, the change feed, and the record-revision lookup.
  * The chain mixes full snapshots (every `snapshotEvery`) and deltas —
  * both kinds rewrite through the same overlay. */
object ProfileDeltaCompaction {
  def main(args: Array[String]): Unit = {
    val nRevs = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // the fixture must actually BE fragmented: AQE would coalesce the
      // tiny per-commit repartitions to one file and synthesize a
      // well-packed chain instead of the many-small-files aftermath this
      // profile exists to measure
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-dprof").resolve("tbl").toString
    val keysPer = 2000
    val t0 = System.nanoTime()
    (1 to nRevs).foreach { i =>
      // each commit re-prices a rotating 10% slice → real deltas
      val state = spark.range(1, keysPer + 1L).toDF("node_key")
        .withColumn("price",
          when(pmod(col("node_key"), lit(10)) === (i % 10),
            xxhash64(col("node_key"), lit(i)).cast("double"))
            .otherwise(col("node_key").cast("double")))
        .repartition(6)
      graft.sources.DeltaTemporalTable.write(spark, state, dir, snapshotEvery = 8)
    }
    println(f"built $nRevs-revision delta chain in ${(System.nanoTime() - t0) / 1e9}%.1fs")

    def countFiles(): Int = {
      // resolve the overlay map ONCE, not per revision
      val ovs = graft.sources.RevisionCompaction.overlays(dir)
      (1 to nRevs).map { r =>
        graft.sources.MetaIO.listFiles(
          graft.sources.RevisionCompaction.effectiveDir(dir, r, ovs)).size
      }.sum
    }
    def timed(label: String)(body: => Long): Double = {
      body // warmup
      val s0 = System.nanoTime()
      val n = body
      require(n > 0)
      val sec = (System.nanoTime() - s0) / 1e9
      println(f"$label: $sec%.2fs")
      sec
    }

    println(s"before: ${countFiles()} data files across $nRevs revisions")
    timed("latest reconstruction (fragmented)")(
      graft.sources.DeltaTemporalTable.read(spark, dir).count())
    timed("history frame (fragmented)")(
      graft.sources.DeltaTemporalTable.readAllRevisions(spark, dir).count())
    timed("change feed (fragmented)")(
      graft.streaming.ChangeFeed.revisionFeed(spark, dir).count())
    timed("record lookup (fragmented)")(
      graft.sources.DeltaTemporalTable.recordRevisions(spark, dir, 7L).count())

    val c0 = System.nanoTime()
    val done = graft.sources.RevisionCompaction.compactHistory(spark, dir,
      targetFileBytes = 1L << 30, includeHead = true)
    println(f"compactHistory: ${done.size} revisions rewritten in " +
      f"${(System.nanoTime() - c0) / 1e9}%.1fs")
    println(s"after: ${countFiles()} data files")

    timed("latest reconstruction (compacted)")(
      graft.sources.DeltaTemporalTable.read(spark, dir).count())
    timed("history frame (compacted)")(
      graft.sources.DeltaTemporalTable.readAllRevisions(spark, dir).count())
    timed("change feed (compacted)")(
      graft.streaming.ChangeFeed.revisionFeed(spark, dir).count())
    timed("record lookup (compacted)")(
      graft.sources.DeltaTemporalTable.recordRevisions(spark, dir, 7L).count())
    spark.stop()
  }
}
