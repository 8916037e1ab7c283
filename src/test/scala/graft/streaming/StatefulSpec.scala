package graft.streaming

import graft.SparkSpec
import graft.sources.TemporalTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000 * 1000 * 1000 // one minute in ns
  private def ns(minute: Long): Long = 1704100000000000000L + minute * M

  test("changeDetect carries last-value state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String)]
    val out = Stateful.changeDetect(
      in.toDF().toDF("k", "ts", "seq", "v"), "k", "ts", "seq", "v")
    val q = out.writeStream.format("memory").queryName("cd_test")
      .outputMode("append").start()
    try {
      in.addData((1L, ns(0), 0L, "a"), (1L, ns(1), 1L, "a"), (1L, ns(2), 2L, "b"))
      q.processAllAvailable()
      // first observation + a→b transition; the repeat 'a' is suppressed
      assert(spark.table("cd_test").count() == 2)
      // next batch starts with the SAME value as the carried state → no emit
      in.addData((1L, ns(3), 3L, "b"))
      q.processAllAvailable()
      assert(spark.table("cd_test").count() == 2)
      // ...then a real change, plus a brand-new key
      in.addData((1L, ns(4), 4L, "c"), (2L, ns(4), 5L, "x"))
      q.processAllAvailable()
      val rows = spark.table("cd_test")
        .select("k", "v", "prev_value").as[(Long, String, Option[String])]
        .collect().toSet
      assert(rows == Set(
        (1L, "a", None), (1L, "b", Some("a")), (1L, "c", Some("b")),
        (2L, "x", None)))
    } finally q.stop()
  }

  test("changeDetect batch mode matches the lag-window formulation") {
    val df = Seq(
      (1L, ns(0), 0L, "a"), (1L, ns(1), 1L, "b"), (1L, ns(2), 2L, "b"),
      (1L, ns(3), 3L, "a"), (2L, ns(0), 4L, "z")).toDF("k", "ts", "seq", "v")
    val got = Stateful.changeDetect(df, "k", "ts", "seq", "v")
      .select("k", "ts", "v").as[(Long, Long, String)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("ts", "seq")
    val want = df.withColumn("p", lag("v", 1).over(w))
      .filter(col("p").isNull || col("p") =!= col("v"))
      .select("k", "ts", "v").as[(Long, Long, String)].collect().toSet
    assert(got == want && got.size == 4)
  }

  test("sessionize closes sessions via event-time timeout in streaming mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val out = Stateful.sessionize(
      in.toDF().toDF("k", "ts", "seq"), "k", "ts", "seq", gapNs = 5 * M)
    val q = out.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      in.addData((1L, ns(0), 0L), (1L, ns(2), 1L))
      q.processAllAvailable()
      // session still open: watermark (10:02) hasn't passed end+gap (10:07)
      assert(spark.table("sess_test").count() == 0)
      // an event far past the gap advances the watermark → timeout fires and
      // the first session closes; the new event opens session two
      in.addData((1L, ns(20), 2L))
      q.processAllAvailable()
      val closed = spark.table("sess_test")
        .select("k", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(closed == Set((1L, ns(0), ns(2), 2L)))
    } finally q.stop()
  }

  test("sessionize: a straggler below the watermark is dropped, the session still closes once") {
    // batch 1: key 1 far in the future drives the watermark high while
    // key 2 opens an old session. batch 2: a straggler for key 2 arrives
    // below the watermark — Spark's late-row filter drops it BEFORE the
    // stateful operator (pinned here: the session closes with only its
    // on-time event and the query keeps running). The timeout the
    // operator schedules is additionally clamped above the current
    // watermark — pure insurance: post-filter every surviving event is
    // >= watermark, but Spark rejects a below-watermark timeout with a
    // permanent query crash, so the clamp guards any version whose
    // late-row filtering differs.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val out = Stateful.sessionize(
      in.toDF().toDF("k", "ts", "seq"), "k", "ts", "seq", gapNs = 5 * M)
    val q = out.writeStream.format("memory").queryName("sess_straggler")
      .outputMode("append").start()
    try {
      in.addData((1L, ns(100), 0L), (2L, ns(0), 1L))
      q.processAllAvailable()
      in.addData((2L, ns(2), 2L)) // below the watermark: dropped as late
      q.processAllAvailable()
      in.addData((1L, ns(200), 3L)) // advances the watermark further
      q.processAllAvailable()
      assert(q.isActive, "query crashed on the straggler batch")
      val closed = spark.table("sess_straggler")
        .filter($"k" === 2L)
        .select("session_start", "session_end", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(closed == Set((ns(0), ns(0), 1L)), s"got $closed")
    } finally q.stop()
  }

  test("changeDetect stateTtl evicts idle keys; a re-appearing key emits fresh") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String)]
    val out = Stateful.changeDetect(
      in.toDF().toDF("k", "ts", "seq", "v"), "k", "ts", "seq", "v",
      stateTtlNs = 5 * M)
    val q = out.writeStream.format("memory").queryName("cd_ttl")
      .outputMode("append").start()
    try {
      in.addData((7L, ns(0), 0L, "a"))
      q.processAllAvailable()
      // watermark sails past key 7's last ord + TTL → state evicted
      in.addData((8L, ns(50), 1L, "x"))
      q.processAllAvailable()
      // the SAME value re-appears: with live state this would be
      // suppressed; after eviction it emits as a fresh first observation
      in.addData((7L, ns(60), 2L, "a"))
      q.processAllAvailable()
      val sevens = spark.table("cd_ttl").filter($"k" === 7L)
        .select("ts", "prev_value").as[(Long, Option[String])].collect().toSet
      assert(sevens == Set((ns(0), None), (ns(60), None)), s"got $sevens")
    } finally q.stop()
  }

  test("sessionize batch mode matches session_window semantics") {
    val df = Seq(
      (1L, ns(0), 0L), (1L, ns(2), 1L), (1L, ns(20), 2L),
      (2L, ns(1), 3L)).toDF("k", "ts", "seq")
    val got = Stateful.sessionize(df, "k", "ts", "seq", gapNs = 5 * M,
      emitOpen = true)
      .select("k", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, ns(0), ns(2), 2L), (1L, ns(20), ns(20), 1L), (2L, ns(1), ns(1), 1L)))
  }

  test("intervalJoin pairs stream-stream rows within the time range") {
    implicit val sqlCtx = spark.sqlContext
    val lin = MemoryStream[(Long, Long, Long)]
    val rin = MemoryStream[(Long, Long, Long)]
    val out = Stateful.intervalJoin(
      lin.toDF().toDF("k", "ts", "lid"), rin.toDF().toDF("k", "ts", "rid"),
      Seq("k"), "ts", "ts", 0L, 10 * M, lateness = "1 minute")
      .select(col("k"), col("lid"), col("right_rid"))
    val q = out.writeStream.format("memory").queryName("ij_test")
      .outputMode("append").start()
    try {
      lin.addData((1L, ns(0), 100L), (2L, ns(0), 101L))
      rin.addData((1L, ns(5), 200L), // in range for lid=100
        (1L, ns(30), 201L), // out of range
        (3L, ns(1), 202L)) // wrong key
      q.processAllAvailable()
      val rows = spark.table("ij_test")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 200L)))
    } finally q.stop()
  }

  test("maintainTable merges each micro-batch into a temporal-table revision") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-maintain")
    val tbl = dir.resolve("tbl").toString
    val ckpt = dir.resolve("ckpt").toString
    val in = MemoryStream[(Long, Double)]
    in.addData((1L, 10.0), (2L, 20.0))
    val q1 = Stateful.maintainTable(
      in.toDF().toDF("node_key", "price"), tbl, Seq("node_key"), ckpt)
    q1.awaitTermination() // AvailableNow drains and stops
    assert(TemporalTable.read(spark, tbl)
      .select("node_key", "price").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0)))
    // second batch: update key 1, insert key 3 → one more committed revision
    in.addData((1L, 11.0), (3L, 30.0))
    val q2 = Stateful.maintainTable(
      in.toDF().toDF("node_key", "price"), tbl, Seq("node_key"), ckpt)
    q2.awaitTermination()
    assert(TemporalTable.commits(tbl).map(_.revision) == Seq(1, 2))
    assert(TemporalTable.read(spark, tbl)
      .select("node_key", "price").as[(Long, Double)].collect().toSet ==
      Set((1L, 11.0), (2L, 20.0), (3L, 30.0)))
    // replay guard (foreachBatch is at-least-once): the same logical
    // batches re-run under a FRESH checkpoint with the same appId must
    // not mint duplicate revisions — the batch markers already in the
    // log dedupe them. A different appId is a new logical query: commits.
    val in2 = MemoryStream[(Long, Double)]
    in2.addData((1L, 11.0))
    val ckpt2 = dir.resolve("ckpt2").toString
    Stateful.maintainTable(in2.toDF().toDF("node_key", "price"), tbl,
      Seq("node_key"), ckpt2).awaitTermination()
    assert(TemporalTable.commits(tbl).map(_.revision) == Seq(1, 2),
      "replayed batch id minted a duplicate revision")
    val in3 = MemoryStream[(Long, Double)]
    in3.addData((4L, 40.0))
    val ckpt3 = dir.resolve("ckpt3").toString
    Stateful.maintainTable(in3.toDF().toDF("node_key", "price"), tbl,
      Seq("node_key"), ckpt3, appId = "q2").awaitTermination()
    assert(TemporalTable.commits(tbl).map(_.revision) == Seq(1, 2, 3))
  }

  test("maintainTable: unscoped markers do not collide with scoped ones") {
    // a SCOPED marker "app=x batch=0" endsWith the unscoped tag
    // "batch=0" — suffix matching made a later default-appId query skip
    // its first batches while the checkpoint advanced (permanent loss);
    // the guard must match the full marker exactly
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-maintain-scope")
    val tbl = dir.resolve("tbl").toString
    val inScoped = MemoryStream[(Long, Double)]
    inScoped.addData((1L, 10.0))
    Stateful.maintainTable(inScoped.toDF().toDF("node_key", "price"), tbl,
      Seq("node_key"), dir.resolve("c1").toString, appId = "x")
      .awaitTermination()
    assert(TemporalTable.commits(tbl).map(_.revision) == Seq(1))
    // new UNSCOPED query, fresh checkpoint → its batch 0 must commit
    val inDefault = MemoryStream[(Long, Double)]
    inDefault.addData((2L, 20.0))
    Stateful.maintainTable(inDefault.toDF().toDF("node_key", "price"), tbl,
      Seq("node_key"), dir.resolve("c2").toString).awaitTermination()
    assert(TemporalTable.commits(tbl).map(_.revision) == Seq(1, 2),
      "unscoped batch 0 was swallowed by a scoped app's marker")
    assert(TemporalTable.read(spark, tbl)
      .select("node_key", "price").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0)))
  }
}
