package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Arbitrary-stateful streaming operators (SURVEY.md §2.12 parity-plus).
  *
  * The reference's incremental machinery is per-commit callbacks
  * (api/PostCommitHook.java, index/ChangeListener.java) — single-JVM,
  * pull-driven. Here the same per-key "react to what changed since last
  * time" semantics are `KeyValueGroupedDataset.flatMapGroupsWithState`
  * operators: state lives in Spark's versioned state store (one shard per
  * shuffle partition, checkpointed, recoverable), so a 1000-executor
  * cluster holds the per-key state partitioned by key hash with no
  * driver-side bottleneck.
  *
  * Every operator also runs in BATCH mode (the Spark unification: the group
  * function sees each key's whole history in one call with empty state) —
  * which is how the DuckDB oracle pins the semantics; the streaming path is
  * covered by MemoryStream specs. Timestamps are epoch-nanosecond longs
  * (the testdata `events.ts` axis); watermarks operate on a derived
  * microsecond TimestampType column.
  */
object Stateful {

  /** One keyed, totally-ordered observation: `ord` is the event-time axis
    * (epoch ns), `tie` breaks equal timestamps deterministically. */
  case class Keyed(key: Long, ord: Long, tie: Long, value: String)

  /** Per-key carry-over between micro-batches. */
  case class LastValue(value: String, ord: Long, tie: Long)

  /** A detected transition; `prev_value` is None for a key's first ever
    * observation. */
  case class Change(key: Long, ord: Long, tie: Long, value: String,
                    prev_value: Option[String])

  /** In-flight session accumulator. */
  case class SessionState(start: Long, end: Long, n: Long)

  /** [[Keyed]] plus the TimestampType twin of `ord` that carries the
    * event-time watermark (Spark requires the watermarked column to be
    * present in the Dataset feeding a stateful operator). */
  case class KeyedTs(key: Long, ord: Long, tie: Long,
                     __ets: java.sql.Timestamp)

  /** A closed (or, in batch mode, final) session. */
  case class Session(key: Long, session_start: Long, session_end: Long,
                     n_events: Long)

  private def keyed(df: DataFrame, keyCol: String, ordCol: String,
                    tieCol: String, valueCol: String): Dataset[Keyed] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast(LongType).as("key"),
      col(ordCol).cast(LongType).as("ord"),
      col(tieCol).cast(LongType).as("tie"),
      col(valueCol).cast("string").as("value")).as[Keyed]
  }

  /** [[Keyed]] plus the TimestampType twin for the watermarked TTL
    * variant of [[changeDetect]]. */
  case class KeyedTsV(key: Long, ord: Long, tie: Long, value: String,
                      __ets: java.sql.Timestamp)

  /** One key's fold: the (changes, carried last) of a sorted batch slice. */
  private def foldChanges(key: Long, sorted: Array[Keyed],
                          prior: Option[LastValue])
      : (Seq[Change], Option[LastValue]) = {
    var last = prior
    val out = Seq.newBuilder[Change]
    sorted.foreach { e =>
      if (!last.exists(_.value == e.value))
        out += Change(e.key, e.ord, e.tie, e.value, last.map(_.value))
      last = Some(LastValue(e.value, e.ord, e.tie))
    }
    (out.result(), last)
  }

  /** Per-key change detection: emit a row whenever a key's `valueCol`
    * differs from the LAST value seen for that key (first observation
    * emits with `prev_value` null) — the reference's change-listener
    * semantics (index/ChangeListener.java) as a distributed operator.
    *
    * Within one call the group's rows are sorted by (ord, tie) — the
    * per-key per-batch slice is the memory bound, never the corpus. Across
    * micro-batches the carried state is the last observation, so the
    * operator is correct when each key's events arrive batch-monotonically
    * (the watermark contract); a straggler older than the carried `ord` is
    * compared against the newer value — the unavoidable cost of bounded
    * state.
    *
    * State bound: the default keeps one [[LastValue]] per key FOREVER —
    * right for closed key sets (the reference's per-node listeners), a
    * leak on unbounded key cardinality. `stateTtlNs > 0` (streaming only)
    * evicts a key's state once the event-time watermark passes its last
    * observation + TTL; a key re-appearing after eviction emits as a
    * fresh first observation (prev_value null) — the documented trade of
    * bounded state. */
  def changeDetect(df: DataFrame, keyCol: String, ordCol: String,
                   tieCol: String, valueCol: String,
                   stateTtlNs: Long = 0L,
                   lateness: String = "0 seconds"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val renames = (d: DataFrame) => d
      .withColumnRenamed("key", keyCol)
      .withColumnRenamed("ord", ordCol)
      .withColumnRenamed("tie", tieCol)
      .withColumnRenamed("value", valueCol)
    if (stateTtlNs > 0 && df.isStreaming) {
      val base = df.select(col(keyCol).cast(LongType).as("key"),
          col(ordCol).cast(LongType).as("ord"),
          col(tieCol).cast(LongType).as("tie"),
          col(valueCol).cast("string").as("value"))
        .withColumn("__ets", expr("timestamp_micros(ord div 1000)"))
        .withWatermark("__ets", lateness)
      return renames(base.as[KeyedTsV]
        .groupByKey(_.key)
        .flatMapGroupsWithState(OutputMode.Append,
            GroupStateTimeout.EventTimeTimeout) {
          (key: Long, it: Iterator[KeyedTsV], state: GroupState[LastValue]) =>
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val sorted = it.map(e => Keyed(e.key, e.ord, e.tie, e.value))
                .toArray.sortBy(e => (e.ord, e.tie))
              val (changes, last) = foldChanges(key, sorted, state.getOption)
              last.foreach { l =>
                state.update(l)
                val ttlMs = (l.ord + stateTtlNs + 999999L) / 1000000L
                state.setTimeoutTimestamp(
                  math.max(state.getCurrentWatermarkMs() + 1, ttlMs))
              }
              changes.iterator
            }
        }
        .toDF())
    }
    renames(keyed(df, keyCol, ordCol, tieCol, valueCol)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Keyed], state: GroupState[LastValue]) =>
          val sorted = it.toArray.sortBy(e => (e.ord, e.tie))
          val (changes, last) = foldChanges(key, sorted, state.getOption)
          last.foreach(state.update)
          changes.iterator
      }
      .toDF())
  }

  /** Event-time sessionization with explicit state: consecutive events of a
    * key whose gaps are ≤ `gapNs` merge into one session; a session closes
    * when the event-time watermark passes its end + gap (streaming) or at
    * end-of-input (batch, `emitOpen = true`).
    *
    * This is `session_window` re-expressed through the arbitrary-state API
    * — the shape to reach for when the per-session payload is more than an
    * aggregate (e.g. carrying a sketch or a sampled prefix per session).
    * State per key is ONE open session (three longs), evicted by the
    * event-time timeout — bounded regardless of stream length.
    *
    * In streaming mode the watermark (from `lateness`) is applied here, on
    * `ordCol`'s derived TimestampType twin — Spark requires the watermarked
    * column inside the Dataset feeding the stateful operator. */
  def sessionize(df: DataFrame, keyCol: String, ordCol: String, tieCol: String,
                 gapNs: Long, emitOpen: Boolean = false,
                 lateness: String = "0 seconds"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val streaming = df.isStreaming // plain Boolean: the group fn must not capture df
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val base = df.select(col(keyCol).cast(LongType).as("key"),
      col(ordCol).cast(LongType).as("ord"),
      col(tieCol).cast(LongType).as("tie"))
      .withColumn("__ets", expr("timestamp_micros(ord div 1000)"))
    val wm = if (streaming) base.withWatermark("__ets", lateness) else base
    wm.as[KeyedTs]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: Long, it: Iterator[KeyedTs], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's end + gap: close it
            val s = state.get
            state.remove()
            Iterator.single(Session(key, s.start, s.end, s.n))
          } else {
            val sorted = it.toArray.sortBy(e => (e.ord, e.tie))
            val out = Seq.newBuilder[Session]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ord - s.end <= gapNs =>
                  open = Some(SessionState(s.start, math.max(s.end, e.ord), s.n + 1))
                case Some(s) =>
                  out += Session(key, s.start, s.end, s.n)
                  open = Some(SessionState(e.ord, e.ord, 1))
                case None =>
                  open = Some(SessionState(e.ord, e.ord, 1))
              }
            }
            open.foreach { s =>
              if (emitOpen && !streaming) out += Session(key, s.start, s.end, s.n)
              else {
                state.update(s)
                if (streaming) {
                  // ceil(end + gap) to ms: separate floor-divisions fired
                  // up to ~2 ms early, wrongly splitting sub-ms sessions.
                  // Clamp above the CURRENT watermark: Spark rejects (and
                  // permanently crashes the query on) a timeout below it,
                  // and a straggler merging into an old session can land
                  // exactly there — the session then closes on the next
                  // watermark advance, which is the soonest legal moment.
                  val endGapMs = (s.end + gapNs + 999999L) / 1000000L
                  state.setTimeoutTimestamp(
                    math.max(state.getCurrentWatermarkMs() + 1, endGapMs))
                }
              }
            }
            out.result().iterator
          }
      }
      .toDF()
      .withColumnRenamed("key", keyCol)
  }

  /** Attach an event-time watermark to an epoch-ns long column by deriving
    * a microsecond TimestampType twin `__ets` (Spark watermarks only bind
    * to TimestampType; the testdata ns values are µs-aligned so the
    * truncation is lossless). Returns the frame with `__ets` appended. */
  def withNsWatermark(df: DataFrame, nsCol: String, lateness: String): DataFrame =
    df.withColumn("__ets", expr(s"timestamp_micros($nsCol div 1000)"))
      .withWatermark("__ets", lateness)

  /** Stream-stream (or batch) interval join: left rows pair with right rows
    * of the same `keys` whose timestamp lands in
    * `[leftTs + lowerNs, leftTs + upperNs]` (bounds must be µs-aligned —
    * the range rides the TimestampType twin columns so that, in streaming
    * mode, Spark recognizes it as an event-time range and EVICTS buffered
    * rows once both watermarks pass the window: bounded join state, the
    * canonical click→conversion attribution shape. In batch mode the same
    * plan is a range join). Right columns arrive under `right_` prefixes
    * for the caller's select. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTsNs: String, rightTsNs: String,
                   lowerNs: Long, upperNs: Long,
                   lateness: String = "0 seconds"): DataFrame = {
    require(lowerNs % 1000 == 0 && upperNs % 1000 == 0,
      "interval bounds must be whole microseconds")
    def ets(df: DataFrame, nsCol: String, outCol: String): DataFrame =
      df.withColumn(outCol, expr(s"timestamp_micros($nsCol div 1000)"))
    val l0 = ets(left, leftTsNs, "__ets")
    val l = if (left.isStreaming) l0.withWatermark("__ets", lateness) else l0
    val rRenamed = right.columns.foldLeft(right) { (d, c) =>
      d.withColumnRenamed(c, s"right_$c")
    }
    val r0 = ets(rRenamed, s"right_$rightTsNs", "__rets")
    val r = if (right.isStreaming) r0.withWatermark("__rets", lateness) else r0
    val keyCond = keys.map(k => l(k) === r(s"right_$k")).reduce(_ && _)
    val rangeCond = expr(
      s"__rets >= __ets + INTERVAL '${lowerNs / 1000}' MICROSECOND AND " +
        s"__rets <= __ets + INTERVAL '${upperNs / 1000}' MICROSECOND")
    l.join(r, keyCond && rangeCond).drop("__ets", "__rets")
  }

  /** Incremental downstream-table maintenance: every micro-batch of
    * `stream` is merged (upsert on `keys`) into the temporal table at
    * `tablePath` — one committed revision per micro-batch, which is the
    * reference's per-commit index-maintenance loop
    * (index/ProjectionIndexChangeListener.java) on foreachBatch.
    *
    * foreachBatch is AT-LEAST-ONCE (a crash between the commit and the
    * streaming checkpoint replays the batch), so the commit message
    * stamps the batch id and a replayed id is skipped — without the
    * guard the table CONTENT stayed correct (same keys, same values) but
    * history gained a spurious duplicate revision and every change-feed
    * consumer received the whole table again. `appId` scopes the markers
    * per logical query ([[TemporalSink]]'s discipline — a new query's
    * checkpoint restarts batch ids at 0). Bootstrap: the first batch
    * creates the table. */
  def maintainTable(stream: DataFrame, tablePath: String, keys: Seq[String],
                    checkpointDir: String, appId: String = ""): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val tag = if (appId.isEmpty) s"batch=$batchId"
                  else s"app=$appId batch=$batchId"
        val log = scala.util.Try(graft.sources.TemporalTable.commits(tablePath))
          .toOption.getOrElse(Seq.empty)
        // Exact-match the marker, not endsWith: with the default unscoped
        // appId the tag is "batch=N", and a SCOPED marker "app=x batch=N"
        // from an earlier query on the same table also endsWith it — the
        // new query would silently skip its first batches while the
        // checkpoint advanced (permanent loss). Same discipline as
        // [[TemporalSink.parseMarker]].
        val replayed = log.exists(c =>
          c.message == s"stream maintenance $tag" ||
            c.message == s"stream bootstrap $tag")
        if (!batch.isEmpty && !replayed) {
          if (log.nonEmpty)
            graft.sources.TemporalTable.merge(spark, tablePath, batch, None, keys,
              message = s"stream maintenance $tag")
          else
            graft.sources.TemporalTable.write(batch, tablePath,
              message = s"stream bootstrap $tag")
        }
        ()
      }
      .start()
}
