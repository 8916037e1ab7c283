package graft.streaming

import graft.SparkSpec
import graft.sources.TemporalTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  test("revisionFeed emits per-revision change records incl. deletes and re-inserts") {
    val p = Files.createTempDirectory("graft-feed").resolve("tbl").toString
    TemporalTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("node_key", "price"), p)
    TemporalTable.write(Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)).toDF("node_key", "price"), p)
    TemporalTable.write(Seq((1L, 11.0), (3L, 31.0)).toDF("node_key", "price"), p) // 2 deleted
    TemporalTable.write(Seq((1L, 11.0), (2L, 99.0), (3L, 31.0)).toDF("node_key", "price"), p) // 2 back
    val feed = ChangeFeed.revisionFeed(spark, p)
      .select("revision", "node_key", "change_type").as[(Int, Long, String)].collect().toSet
    assert(feed == Set(
      (1, 1L, "insert"), (1, 2L, "insert"),
      (2, 1L, "update"), (2, 3L, "insert"),
      (3, 2L, "delete"), (3, 3L, "update"),
      (4, 2L, "insert")))
    // incremental consumption from a checkpointed revision
    val tail = ChangeFeed.revisionFeed(spark, p, fromRevision = 2)
      .select("revision", "node_key", "change_type").as[(Int, Long, String)].collect().toSet
    assert(tail == Set((3, 2L, "delete"), (3, 3L, "update"), (4, 2L, "insert")))
  }

  test("revisionFeed on a delta layout matches the snapshot layout's feed") {
    import graft.sources.DeltaTemporalTable
    val snaps = Seq(
      Seq((1L, 10.0), (2L, 20.0)),
      Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)),
      Seq((1L, 11.0), (3L, 31.0)),
      Seq((1L, 11.0), (2L, 99.0), (3L, 31.0)),
      Seq((1L, 12.0), (2L, 99.0), (3L, 31.0)))
    val pSnap = Files.createTempDirectory("graft-feed-s").resolve("tbl").toString
    val pDelta = Files.createTempDirectory("graft-feed-d").resolve("tbl").toString
    snaps.foreach { rows =>
      TemporalTable.write(rows.toDF("node_key", "price"), pSnap)
      // snapshotEvery=3 → revisions 1 and 4 are FULL, the rest deltas
      DeltaTemporalTable.write(spark, rows.toDF("node_key", "price"), pDelta,
        snapshotEvery = 3)
    }
    // sorted Seq, not Set: a feed emitting duplicate change records must
    // fail this, not have them silently collapsed
    def feedOf(p: String, from: Int = 0) =
      ChangeFeed.revisionFeed(spark, p, from)
        .select("revision", "node_key", "change_type")
        .as[(Int, Long, String)].collect().toSeq.sorted
    assert(feedOf(pDelta) == feedOf(pSnap))
    assert(feedOf(pDelta, from = 3) == feedOf(pSnap, from = 3))
    // a compaction duplicates state, not history: the feed emits nothing
    // for it
    val compactRev = DeltaTemporalTable.compact(spark, pDelta)
    assert(!feedOf(pDelta).exists(_._1 == compactRev))
  }

  test("revisionFeed plan stays flat over a long history (no N-way union)") {
    val p = Files.createTempDirectory("graft-feed-long").resolve("tbl").toString
    // 100 single-row revisions: key 1 updated every revision, key r inserted at r
    (1 to 100).foreach { r =>
      TemporalTable.write(Seq((1L, r.toDouble), (r.toLong + 100, 0.0))
        .toDF("node_key", "price"), p)
    }
    val feed = ChangeFeed.revisionFeed(spark, p)
    // one union (upserts + deletes), never one branch per revision
    val unions = feed.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u.children.size
    }
    assert(unions.forall(_ <= 4), s"expected a flat plan, union widths: $unions")
    val rows = feed.select("revision", "node_key", "change_type")
      .as[(Int, Long, String)].collect()
    assert(rows.count(_._3 == "insert") == 100 + 1) // key r+100 per rev, key 1 once
    assert(rows.count(_._3 == "update") == 99) // key 1 every later revision
    assert(rows.count(_._3 == "delete") == 99) // key r+100 vanishes next revision
    // spot checks
    assert(rows.toSet.contains((1, 101L, "insert")))
    assert(rows.toSet.contains((2, 101L, "delete")))
    assert(rows.toSet.contains((100, 1L, "update")))
  }

  test("streamTable picks up new revisions incrementally") {
    val p = Files.createTempDirectory("graft-stream").resolve("tbl").toString
    TemporalTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("node_key", "price"), p)
    val q = ChangeFeed.streamTable(spark, p)
      .writeStream.format("memory").queryName("revstream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("revstream_test").count() == 2)
      TemporalTable.write(Seq((1L, 11.0), (3L, 30.0)).toDF("node_key", "price"), p)
      q.processAllAvailable()
      val rows = spark.table("revstream_test")
        .select("rev", "node_key").as[(Int, Long)].collect().toSet
      assert(rows == Set((1, 1L), (1, 2L), (2, 1L), (2, 3L)))
    } finally q.stop()
  }

  test("streamCommits: revision-atomic micro-batches from the commit log") {
    import org.apache.spark.sql.functions.col
    val p = Files.createTempDirectory("graft-cstream").resolve("tbl").toString
    TemporalTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("node_key", "price"), p)
    val q = ChangeFeed.streamCommits(spark, p)
      .writeStream.format("memory").queryName("cstream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cstream_test").count() == 2)
      // a reserved-but-uncommitted revision is INVISIBLE: data in rev=N/
      // without a commit entry must not stream (offsets advance on the log)
      val r = TemporalTable.reserveRevision(p)
      Seq((9L, 99.0)).toDF("node_key", "price")
        .write.mode("overwrite").parquet(s"$p/rev=$r")
      q.processAllAvailable()
      assert(spark.table("cstream_test").count() == 2,
        "uncommitted revision must not be streamed")
      // committing makes it visible as one atomic batch
      TemporalTable.logCommit(p, r, "t", "")
      q.processAllAvailable()
      val rows = spark.table("cstream_test")
        .select(col("rev"), col("node_key")).as[(Int, Long)].collect().toSet
      assert(rows == Set((1, 1L), (1, 2L), (r, 9L)))
    } finally q.stop()
  }

  test("streamCommits serves an evolved table under the union schema") {
    import org.apache.spark.sql.functions.col
    val p = Files.createTempDirectory("graft-cstream-evol").resolve("tbl").toString
    TemporalTable.write(Seq((1L, 10.0)).toDF("node_key", "price"), p)
    TemporalTable.write(Seq((2L, 20.0, "eur")).toDF("node_key", "price", "ccy"), p)
    val q = ChangeFeed.streamCommits(spark, p)
      .writeStream.format("memory").queryName("cstream_evol")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cstream_evol")
        .select(col("rev"), col("node_key"), col("ccy"))
        .as[(Int, Long, Option[String])].collect().toSet
      assert(rows == Set((1, 1L, None), (2, 2L, Some("eur"))),
        s"got $rows — rev 1 must stream with a null ccy, not a dropped column")
    } finally q.stop()
  }

  test("streamCommits: AvailableNow drains bounded batches then stops") {
    val p = Files.createTempDirectory("graft-cstream-an").resolve("tbl").toString
    (1 to 5).foreach(i =>
      TemporalTable.write(Seq((i.toLong, i * 1.0)).toDF("node_key", "v"), p))
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = ChangeFeed.streamCommits(spark, p, maxRevisionsPerBatch = 2)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        batchSizes.add(df.count()); ()
      })
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cstream-an-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow query must terminate on its own")
    // 5 one-row revisions at 2 revisions/batch → batches of 2, 2, 1 rows
    import scala.jdk.CollectionConverters._
    assert(batchSizes.asScala.toSeq.sorted == Seq(1L, 2L, 2L),
      s"batches: ${batchSizes.asScala.toSeq}")
  }

  test("streamCommits over a delta table is a CDC feed of change records") {
    import org.apache.spark.sql.functions.col
    import graft.sources.DeltaTemporalTable
    val p = Files.createTempDirectory("graft-cdc").resolve("tbl").toString
    DeltaTemporalTable.write(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("node_key", "price"), p, snapshotEvery = 4)
    val q = ChangeFeed.streamCommits(spark, p)
      .writeStream.format("memory").queryName("cdc_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // bootstrap full snapshot: plain rows, no change marker
      val boot = spark.table("cdc_test")
        .select(col("rev"), col("node_key"), col("__change_type"))
        .as[(Int, Long, Option[String])].collect().toSet
      assert(boot == Set((1, 1L, None), (1, 2L, None)))
      // delta commit: upd 1, del 2, ins 3 → three change records
      DeltaTemporalTable.write(spark,
        Seq((1L, 11.0), (3L, 30.0)).toDF("node_key", "price"), p, snapshotEvery = 4)
      q.processAllAvailable()
      val changes = spark.table("cdc_test").filter(col("rev") === 2)
        .select(col("node_key"), col("__change_type"), col("price"))
        .as[(Long, Option[String], Option[Double])].collect().toSet
      assert(changes == Set(
        (1L, Some("update"), Some(11.0)),
        (2L, Some("delete"), None),
        (3L, Some("insert"), Some(30.0))))
    } finally q.stop()
  }

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("tumblingCounts aggregates event-time windows on a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = ChangeFeed.tumblingCounts(
      in.toDF().toDF("ts", "user"), "ts", "10 minutes", "5 minutes", Seq("user"))
    val q = agg.writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      in.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "a"), (ts(3), "b"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("user", "cnt").as[(String, Long)].collect().toSet
      assert(rows == Set(("a", 2L), ("a", 1L), ("b", 1L)))
    } finally q.stop()
  }

  test("sessionAgg merges events within the gap into one session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = ChangeFeed.sessionAgg(
      in.toDF().toDF("ts", "user"), "ts", "5 minutes", "1 minute", Seq("user"))
    val q = agg.writeStream.format("memory").queryName("session_test")
      .outputMode("complete").start()
    try {
      // two bursts for user a separated by > gap, one event for b
      in.addData((ts(0), "a"), (ts(2), "a"), (ts(20), "a"), (ts(1), "b"))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .select("user", "n_events").as[(String, Long)].collect()
      assert(rows.count(_._1 == "a") == 2) // two sessions for a
      assert(rows.filter(_._1 == "a").map(_._2).sorted.toSeq == Seq(1L, 2L))
      assert(rows.count(_._1 == "b") == 1)
    } finally q.stop()
  }

  test("watermark drops late data past the lateness bound (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = ChangeFeed.tumblingCounts(
      in.toDF().toDF("ts", "user"), "ts", "10 minutes", "5 minutes", Seq("user"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      in.addData((ts(1), "a"), (ts(29), "a")) // watermark → 10:24
      q.processAllAvailable()
      // 10:02 is later than watermark-closed window [10:00,10:10) → dropped;
      // 10:35 advances the watermark to 10:30, finalizing both windows
      in.addData((ts(2), "a"), (ts(35), "a"))
      q.processAllAvailable()
      in.addData((ts(50), "a")) // push watermark past [10:30,10:40)
      q.processAllAvailable()
      val counts = spark.table("late_test")
        .select("win_start", "cnt").as[(Timestamp, Long)].collect().toMap
      assert(counts(Timestamp.valueOf("2024-01-01 10:00:00")) == 1L,
        s"late row must be dropped, got $counts") // not 2
      assert(counts(Timestamp.valueOf("2024-01-01 10:20:00")) == 1L)
    } finally q.stop()
  }

  test("streamingDedup drops cross-batch duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = ChangeFeed.streamingDedup(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes", Seq("doc_id"))
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, "a"), (ts(1), 2L, "b"), (ts(1), 1L, "a-dup"))
      q.processAllAvailable()
      in.addData((ts(2), 1L, "a-again"), (ts(3), 3L, "c"))
      q.processAllAvailable()
      val rows = spark.table("dedup_test").select("doc_id").as[Long].collect().sorted
      assert(rows.toSeq == Seq(1L, 2L, 3L)) // each key exactly once
      // State is BOUNDED: key 1 was first seen at 10:00 with 10 min lateness,
      // so once the watermark passes 10:10 its state row is evicted and the
      // key is re-admitted — the dropDuplicatesWithinWatermark contract.
      // (The old dropDuplicates(keys) kept every key forever and would
      // suppress this row.)
      in.addData((ts(30), 4L, "d")) // advances watermark to 10:20
      q.processAllAvailable()
      in.addData((ts(35), 1L, "a-reborn"))
      q.processAllAvailable()
      val after = spark.table("dedup_test").select("doc_id").as[Long].collect().sorted
      assert(after.toSeq == Seq(1L, 1L, 2L, 3L, 4L),
        s"expired key must be re-admitted after watermark passes, got ${after.toSeq}")
    } finally q.stop()
  }

  test("slidingAgg runs in batch mode too (unified plan)") {
    val batch = Seq((ts(0), "a", 1.0), (ts(4), "a", 2.0), (ts(9), "a", 3.0))
      .toDF("ts", "user", "v")
    val out = ChangeFeed.slidingAgg(batch, "ts", "10 minutes", "5 minutes",
      "1 minute", Seq("user"), "v")
    // windows [9:55,10:05), [10:00,10:10), [10:05,10:15) → 3 windows hit
    assert(out.count() == 3)
  }
}
