package graft.streaming

import graft.SparkSpec
import graft.sources.TemporalTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

class TemporalSinkSpec extends SparkSpec {
  import spark.implicits._

  test("each micro-batch commits one revision; temporal reads compose") {
    implicit val sqlCtx = spark.sqlContext
    val p = Files.createTempDirectory("graft-sink").resolve("tbl").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("node_key", "name")
      .writeStream
      .foreachBatch(TemporalSink.revisionWriter(p))
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ckpt").toString)
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((1L, "a2"), (3L, "c"))
      q.processAllAvailable()
      assert(TemporalTable.commits(p).map(_.revision) == Seq(1, 2))
      assert(TemporalTable.commits(p).map(_.message) == Seq("batch=0", "batch=1"))
      // streamed revisions behave exactly like batch commits
      val snap2 = TemporalTable.read(spark, p, Some(2))
      assert(snap2.select("node_key").as[Long].collect().toSet == Set(1L, 3L))
      val feed = ChangeFeed.revisionFeed(spark, p)
        .filter(col("revision") === 2)
        .select("node_key", "change_type").as[(Long, String)].collect().toSet
      assert(feed == Set((1L, "update"), (3L, "insert"), (2L, "delete")))
    } finally q.stop()
  }

  test("a replayed batchId never double-commits; empty batches commit nothing") {
    val p = Files.createTempDirectory("graft-sink-replay").resolve("tbl").toString
    val w = TemporalSink.revisionWriter(p)
    val batch = Seq((1L, "a")).toDF("node_key", "name")
    w(batch, 0L)
    w(batch, 0L) // retry of the same micro-batch (warm watermark cache)
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1))
    // retry after a driver restart: the cache is cold, the log decides
    TemporalSink.invalidate(p)
    w(batch, 0L)
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1))
    w(batch.limit(0), 1L) // empty micro-batch
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1))
    w(batch, 2L)
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1, 2))
  }

  test("appId scopes markers: a new logical query on an existing table is not dropped") {
    val p = Files.createTempDirectory("graft-sink-appid").resolve("tbl").toString
    // query 1 (unscoped, legacy markers) commits batches 0..2
    val w1 = TemporalSink.revisionWriter(p)
    (0L to 2L).foreach(i => w1(Seq((i, "a")).toDF("node_key", "name"), i))
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1, 2, 3))
    // query 2: fresh checkpoint restarts batch ids at 0 — under the
    // unscoped default its first batches would silently drop against
    // query 1's markers; with its own appId it starts from a clean slate
    val w2 = TemporalSink.revisionWriter(p, appId = "q2")
    w2(Seq((10L, "x")).toDF("node_key", "name"), 0L)
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1, 2, 3, 4),
      "new query's batch 0 was dropped against the old query's markers")
    assert(TemporalTable.commits(p).last.message == "app=q2 batch=0")
    // replays within query 2 stay no-ops (cold cache: the log decides)
    TemporalSink.invalidate(p)
    w2(Seq((10L, "x")).toDF("node_key", "name"), 0L)
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1, 2, 3, 4))
    // ...and query 2's markers never mask query 1's axis
    w1(Seq((11L, "y")).toDF("node_key", "name"), 3L)
    assert(TemporalTable.commits(p).map(_.revision) == Seq(1, 2, 3, 4, 5))
  }

  test("replay check tail-reads the log: per-batch metadata GETs stay O(1) on an aged table") {
    import graft.sources.MetaIO
    val p = Files.createTempDirectory("graft-sink-aged").resolve("tbl").toString
    val w = TemporalSink.revisionWriter(p, withManifest = false, withKeyIndex = false)
    val batch = Seq((1L, "a")).toDF("node_key", "name")
    w(batch, 0L)
    // age the table: 1000 committed revisions' log entries (metadata only
    // — the watermark logic reads nothing but the log)
    val dir = TemporalTable.commitsDir(p)
    (2 to 1001).foreach { r =>
      MetaIO.createNew(f"$dir/$r%08d.json",
        s"""{"revision":$r,"commitTsMs":$r,"author":"x","message":"batch=${r - 1}"}""")
    }
    // cold cache: one refresh is allowed to read the whole log tail once
    TemporalSink.invalidate(p)
    w(batch, 1001L)
    // warm steady state: each further batch must cost O(1) GETs — a
    // listing plus the entries committed since the last one — not a
    // re-read of all ~1000 historical entries
    val before = MetaIO.readCount.get()
    w(batch, 1002L)
    val gets = MetaIO.readCount.get() - before
    assert(gets <= 15, s"micro-batch cost $gets metadata GETs on a 1000-revision table")
    // and the replay guarantee still holds at depth
    w(batch, 1002L)
    assert(TemporalTable.commits(p).count(_.message == "batch=1002") == 1)
  }
}
