package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Stateful

/** Stateful-streaming operator coverage (SURVEY.md §2.12 parity-plus),
  * exercised in BATCH mode over the driver's `events` table so the DuckDB
  * oracle can pin the semantics relationally (the Spark batch/streaming
  * unification: the same [[graft.streaming.Stateful]] plans run under
  * `readStream` with watermarks — covered by StatefulSpec's MemoryStream
  * tests).
  */
object StreamingQueries {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val GapNs = 6 * HourNs

  private def ev(s: SparkSession, d: String): DataFrame = Tables.df(s, d, "events")

  /** The oracle axis is MICROSECONDS: Spark reads the events parquet's
    * TIMESTAMP(NANOS) at full ns (`nanosAsLong`) while DuckDB truncates it
    * to µs on read, so every emitted timestamp (and every gap/range
    * comparison that must agree bit-for-bit) is computed on `ts div 1000`
    * in Spark and `epoch_us(ts)` in DuckDB. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // flatMapGroupsWithState change detection (the reference's
    // index/ChangeListener.java semantics as a keyed stateful operator)
    "t_change_detect" -> { (s, d) =>
      Stateful.changeDetect(
        ev(s, d).withColumn("ts_us", expr("ts div 1000"))
          .select("user_id", "ts_us", "event_id", "event_type"),
        "user_id", "ts_us", "event_id", "event_type")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
          col("prev_value").as("prev_type"))
        .orderBy("user_id", "ts_us", "event_id")
    },
    // flatMapGroupsWithState sessionization with explicit state (the
    // arbitrary-state twin of ChangeFeed.sessionAgg's session_window)
    "t_sessionize" -> { (s, d) =>
      Stateful.sessionize(
        ev(s, d).withColumn("ts_us", expr("ts div 1000"))
          .select("user_id", "ts_us", "event_id"),
        "user_id", "ts_us", "event_id", GapNs / 1000, emitOpen = true)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    },
    // TRUE streaming execution with late-data drops: the events table
    // replays as two deterministic micro-batches through a MemoryStream
    // into ChangeFeed.tumblingCounts (6 h windows, 1 h watermark, append
    // mode). Batch 1 is the [10%, 50%) slice of the (ts, event_id) order;
    // batch 2 replays the bottom 10% LATE (their windows were finalized
    // when batch 1's watermark passed) plus the top half on time. The
    // memory-sink result is returned as the batch answer, so the oracle
    // pins Spark's actual watermark semantics relationally: a window is
    // emitted once window_end <= final watermark, and a late row is
    // dropped when its window_end <= the watermark in force at its
    // arrival. The driver-side collect here is the REPLAY HARNESS
    // (MemoryStream feeds from the driver by design), not the operator —
    // the plan under test is the same unbounded streaming plan
    // StatefulSpec runs.
    "t_late_data" -> { (s, d) =>
      import s.implicits._
      val sorted = ev(s, d).select(col("user_id"), col("ts"), col("event_id"))
        .as[(Long, Long, Long)].collect()
        .sortBy(r => (r._2, r._3))
      val n = sorted.length
      val (lo, mid) = (n / 10, n / 2)
      val batch1 = sorted.slice(lo, mid).toSeq
      val batch2 = (sorted.slice(0, lo) ++ sorted.slice(mid, n)).toSeq
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long)]
      val events = in.toDF().toDF("user_id", "ts_ns", "event_id")
        .withColumn("ts_t", timestamp_micros(expr("ts_ns div 1000")))
      val out = graft.streaming.ChangeFeed.tumblingCounts(
        events, "ts_t", "6 hours", "1 hour", Seq.empty)
      val name = s"late_data_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(batch1)
        q.processAllAvailable()
        in.addData(batch2)
        q.processAllAvailable()
      } finally q.stop()
      s.table(name)
        .select(unix_micros(col("win_start")).as("win_start_us"), col("cnt"))
        .orderBy("win_start_us")
    },
    // stream-stream interval join (click→purchase attribution within 1h);
    // in streaming mode the same plan bounds its join state by watermark
    "t_stream_interval_join" -> { (s, d) =>
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      Stateful.intervalJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
        0L, HourNs)
        .select(col("user_id"), col("click_id"),
          col("right_purchase_id").as("purchase_id"),
          (expr("right_ts div 1000") - expr("ts div 1000")).as("delta_us"))
        .orderBy("user_id", "click_id", "purchase_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "t_change_detect" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT user_id, ts_us, event_id, event_type, prev_type FROM o
        |WHERE prev_type IS NULL OR prev_type != event_type
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "t_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        | s AS (
        |  SELECT user_id, ts_us,
        |    SUM(CASE WHEN prev IS NULL OR ts_us - prev > 21600000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, MIN(ts_us) AS session_start, MAX(ts_us) AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // watermark semantics, relationally: wm1 = max(batch-1 ts) - 1 h is in
    // force while batch 2 processes (late rows whose 6 h window already
    // finalized drop); wmf = max(all ts) - 1 h decides which windows the
    // append-mode sink has emitted by the end
    "t_late_data" ->
      """WITH s AS (
        |  SELECT epoch_us(ts) AS ts_us,
        |    ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM events),
        |marked AS (
        |  SELECT ts_us,
        |    CASE WHEN rn >= n // 10 AND rn < n // 2 THEN 1 ELSE 2 END AS batch
        |  FROM s),
        |wm AS (
        |  SELECT MAX(CASE WHEN batch = 1 THEN ts_us END) - 3600000000 AS wm1,
        |         MAX(ts_us) - 3600000000 AS wmf
        |  FROM marked),
        |win AS (
        |  SELECT ts_us, batch,
        |    (ts_us // 21600000000) * 21600000000 AS ws,
        |    (ts_us // 21600000000) * 21600000000 + 21600000000 AS we
        |  FROM marked),
        |kept AS (
        |  SELECT win.* , wm.wmf FROM win, wm
        |  WHERE NOT (win.batch = 2 AND win.we <= wm.wm1))
        |SELECT ws AS win_start_us, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM kept WHERE we <= wmf
        |GROUP BY ws ORDER BY win_start_us""".stripMargin,
    "t_stream_interval_join" ->
      """SELECT a.user_id AS user_id, a.event_id AS click_id,
        |  b.event_id AS purchase_id,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a.user_id, click_id, purchase_id""".stripMargin
  )
}
