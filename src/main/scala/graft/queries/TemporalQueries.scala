package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Diff, Temporal}

/** Transaction-time / valid-time operator coverage (SURVEY.md §2.8-2.9) over
  * the driver's `events` changelog: `user_id` plays the stable node key,
  * event order per user plays the revision axis, `ts` (epoch-nanosecond
  * long, see [[graft.Tables.df]]) plays both commit and valid time.
  *
  * Every query routes through the [[graft.operators.Temporal]] /
  * [[graft.operators.Diff]] library operators — the oracle SQL re-derives
  * the same semantics relationally in DuckDB (`ts` compares identically as
  * TIMESTAMP_NS there; epoch_ns() reproduces our long axis).
  */
object TemporalQueries {

  /** 2024-01-15T00:00Z / 2024-01-23T00:00Z on the ns axis. */
  private val T1 = 1705276800000000000L
  private val T2 = 1705968000000000000L

  private def ev(s: SparkSession, d: String): DataFrame = Tables.df(s, d, "events")
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // jn:all-times / sdb:item-history — the full history frame
    "t_history" -> { (s, d) =>
      Temporal.asHistory(ev(s, d), "user_id", Seq("ts", "event_id"))
        .select("user_id", "revision", "event_id", "value")
        .orderBy("user_id", "revision")
    },
    // jn:past (or-self) below a revision bound
    "t_past" -> { (s, d) =>
      Temporal.past(
        Temporal.asHistory(ev(s, d), "user_id", Seq("ts", "event_id")),
        "revision", 3, orSelf = false)
        .select("user_id", "revision", "event_id")
        .orderBy("user_id", "revision")
    },
    // jn:previous / jn:next via lag/lead over the revision axis
    "t_prev_next" -> { (s, d) =>
      Temporal.withPreviousNext(ev(s, d), "user_id", Seq("ts", "event_id"), Seq("value"))
        .select("user_id", "event_id", "prev_value", "next_value")
        .orderBy("user_id", "event_id")
    },
    // jn:first / jn:last per key
    "t_first_last" -> { (s, d) =>
      Temporal.firstLast(ev(s, d), "user_id", Seq("ts", "event_id"), "value")
        .orderBy("user_id")
    },
    // jn:first-existing / jn:last-existing / revision count
    "t_existence" -> { (s, d) =>
      Temporal.asHistory(ev(s, d), "user_id", Seq("ts", "event_id"))
        .groupBy("user_id")
        .agg(min("revision").as("first_existing"),
          max("revision").as("last_existing"),
          count(lit(1)).as("n_revisions"),
          min("event_id").as("first_event"),
          max("event_id").as("last_event"))
        .orderBy("user_id")
    },
    // jn:open(db, res, ts): as-of snapshot at T1
    "t_asof" -> { (s, d) =>
      Temporal.asOf(ev(s, d), "user_id", "ts", "event_id", lit(T1))
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    },
    // jn:open-revisions(t1, t2): the change window
    "t_open_revisions" -> { (s, d) =>
      ev(s, d).filter(col("ts") >= T1 && col("ts") < T2)
        .select("user_id", "event_id", "value")
        .orderBy("event_id")
    },
    // jn:diff — the flagship temporal cross-revision join
    // (docs/ARCHITECTURE.md:469-486): snapshots at T1 and T2 on node_key
    "t_diff_snapshots" -> { (s, d) =>
      val e = ev(s, d)
      val snapA = Temporal.asOf(e, "user_id", "ts", "event_id", lit(T1))
      val snapB = Temporal.asOf(e, "user_id", "ts", "event_id", lit(T2))
      Diff.diff(snapA, snapB, Seq("user_id"), Seq("event_id", "value"))
        .select("user_id", "change_type", "old_event_id", "new_event_id",
          "old_value", "new_value")
        .orderBy("user_id")
    },
    // valid-time intervals derived from the changelog (RI-tree analog)
    "t_valid_intervals" -> { (s, d) =>
      Temporal.asValidIntervals(ev(s, d), "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"),
          expr("valid_from div 1000").as("valid_from_us"),
          expr("valid_to div 1000").as("valid_to_us"))
        .orderBy("user_id", "valid_from_us", "event_id")
    },
    // jn:valid-at — interval stab at T1
    "t_valid_at" -> { (s, d) =>
      Temporal.validAt(
        Temporal.asValidIntervals(ev(s, d), "user_id", "ts", "event_id"), lit(T1))
        .select(col("user_id"), col("event_id"),
          expr("valid_from div 1000").as("valid_from_us"))
        .orderBy("user_id")
    },
    // jn:valid-at over a REVISIONED table through the commit-maintained
    // fork index (reference: ValidTimeIntervalIndexWriter via
    // ChangeListener): the valid intervals land in a temporal table whose
    // persisted policy writes the `_vindex` RI-tree sidecar at commit;
    // the stab reads only the ≤log2(axis) fork partitions on T1's root
    // path instead of scanning the revision (pruning spec-pinned in
    // ValidTimeIndexSpec; this row pins the answer equals the plain stab)
    "t_valid_at_indexed" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-vindex")
        .toString + "/tbl"
      val iv = Temporal.asValidIntervals(ev(s, d), "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("valid_from"), col("valid_to"))
      // granularity 1 h on the ns axis — near the median interval length
      graft.sources.ValidTimeIndex.setPolicy(p, "valid_from", "valid_to",
        granularity = 3600000000000L)
      graft.sources.TemporalTable.write(iv, p)
      graft.sources.ValidTimeIndex.validAt(s, p, T1)
        .select(col("user_id"), col("event_id"),
          expr("valid_from div 1000").as("valid_from_us"))
        .orderBy("user_id")
    },
    // the same fork-indexed stab over a DELTA-ENCODED chain: revision 1
    // (full, epoch base) carries the `_vindex` sidecar; revision 2 is a
    // delta commit (drops every 7th user's intervals) with no sidecar of
    // its own — the stab serves from the epoch base's pruned forks plus
    // the one small delta file (ValidTimeIndexSpec pins the file-read
    // evidence; this row pins the answer against a raw recompute)
    "t_valid_at_delta" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-vindex-delta")
        .toString + "/tbl"
      val iv = Temporal.asValidIntervals(ev(s, d), "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("valid_from"), col("valid_to"))
      graft.sources.ValidTimeIndex.setPolicy(p, "valid_from", "valid_to",
        granularity = 3600000000000L)
      graft.sources.DeltaTemporalTable.write(s, iv, p, keys = Seq("event_id"))
      graft.sources.DeltaTemporalTable.write(s,
        iv.filter(col("user_id") % 7 =!= 0), p, keys = Seq("event_id"))
      graft.sources.ValidTimeIndex.validAt(s, p, T1, Some(2))
        .select(col("user_id"), col("event_id"),
          expr("valid_from div 1000").as("valid_from_us"))
        .orderBy("user_id")
    },
    // jn:open-bitemporal — transaction-axis restriction + valid-time stab
    "t_bitemporal" -> { (s, d) =>
      Temporal.openBitemporal(ev(s, d), "user_id", "ts", "event_id",
        col("event_id") <= 8000, lit(T1))
        .select(col("user_id"), col("event_id"),
          expr("valid_from div 1000").as("valid_from_us"))
        .orderBy("user_id")
    },
    // row-level as-of join (§2.3): each purchase gets the latest preceding
    // view's value for the same user — single-shuffle union-window plan
    "t_asof_join" -> { (s, d) =>
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      Temporal.asOfJoin(purchases, views, "user_id", "ts", "ts", Seq("value"))
        .select("event_id", "user_id", "value", "asof_value")
        .orderBy("event_id")
    },
    // interval-overlap range join (RI-tree analog, §2.3/§2.10): user valid
    // intervals × 5 fixed query windows, bucketized to stay an equi-join
    "t_interval_overlap" -> { (s, d) =>
      import org.apache.spark.sql.types.LongType
      val dayUs = 86400000000L
      val jan1Us = 1704067200000000L // 2024-01-01T00:00Z
      val iv = Temporal.asValidIntervals(
          ev(s, d).filter(col("user_id") < 10), "user_id", "ts", "event_id")
        .filter(col("valid_to").isNotNull)
        .select(col("user_id"), col("event_id"),
          expr("valid_from div 1000").as("vf"), expr("valid_to div 1000").as("vt"))
      val win = s.range(5)
        .select(col("id").cast("int").as("win_id"),
          (lit(jan1Us) + (col("id") * 5 + 4) * dayUs).cast(LongType).as("vf"),
          (lit(jan1Us) + (col("id") * 5 + 4) * dayUs + 2 * dayUs).cast(LongType).as("vt"))
      graft.operators.Intervals.overlapJoin(iv, win, "vf", "vt", dayUs)
        .select(col("l_user_id").as("user_id"), col("l_event_id").as("event_id"),
          col("r_win_id").as("win_id"))
        .orderBy("user_id", "event_id", "win_id")
    },
    // interval coalescing (temporal normalization): each event opens a 6 h
    // validity interval; overlapping/adjacent intervals per user merge
    // into maximal islands — one key-shuffled window + one aggregate
    "t_interval_coalesce" -> { (s, d) =>
      val sixHoursUs = 21600000000L
      val iv = ev(s, d).select(col("user_id"),
        expr("ts div 1000").as("vf"),
        (expr("ts div 1000") + sixHoursUs).as("vt"))
      graft.operators.Intervals.coalesceIntervals(iv, Seq("user_id"), "vf", "vt")
        .orderBy("user_id", "vf")
    },
    // duration-weighted temporal aggregation: each event's value holds
    // until the user's next event (piecewise-constant signal); the
    // weighted average reads the signal's true time integral
    "t_time_weighted" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val iv = ev(s, d)
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .select(col("user_id"), col("value"),
          expr("ts div 1000").as("vf"), expr("next_ts div 1000").as("vt"))
      graft.operators.Intervals.timeWeightedAvg(iv, Seq("user_id"), "vf", "vt", "value")
        .select(col("user_id"), col("total_duration"),
          round(col("weighted_avg"), 4).as("weighted_avg"))
        .orderBy("user_id")
    },
    // full Allen interval algebra over consecutive per-user event
    // intervals (6 h validity each): equal-length intervals exercise
    // before / meets / overlaps / equals; the classifier is total —
    // exactly one relation per pair — so the counts partition the pairs
    "t_allen" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sixHoursUs = 21600000000L
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = ev(s, d)
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .select(expr("ts div 1000").as("af"),
          (expr("ts div 1000") + sixHoursUs).as("at"),
          expr("next_ts div 1000").as("bf"),
          (expr("next_ts div 1000") + sixHoursUs).as("bt"))
      pairs.select(graft.operators.Intervals.allen(
          col("af"), col("at"), col("bf"), col("bt")).as("relation"))
        .groupBy("relation").agg(count(lit(1)).as("cnt"))
        .orderBy("relation")
    },
    // event-time tumbling window via the built-in window() operator
    "t_window_fn" -> { (s, d) =>
      ev(s, d)
        .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
        .groupBy(window(col("ets"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("cnt"))
        .orderBy("win_start", "event_type")
    },
    // sliding-window aggregation (6 h windows every 3 h — each event lands
    // in exactly two windows; the same ChangeFeed.slidingAgg plan runs
    // under readStream with the watermark bounding state). Decimal-cast
    // sum keeps the fold order-independent for the hash compare.
    "t_window_sliding" -> { (s, d) =>
      val df = ev(s, d)
        .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
        .withColumn("value", col("value").cast("decimal(18,2)"))
      graft.streaming.ChangeFeed.slidingAgg(df, "ets", "6 hours", "3 hours",
          "1 hour", Seq("event_type"), "value")
        .select(unix_timestamp(col("win_start")).as("win_start"),
          col("event_type"), col("cnt"),
          col("sum_val").cast("double").as("sum_value"))
        .orderBy("win_start", "event_type")
    },
    // native session_window aggregation (gap 6 h) — the built-in twin of
    // the Stateful.sessionize oracle row; session end = last event + gap
    // per Spark's session semantics, a new session opens when the gap is
    // REACHED (>= gap, half-open window)
    "t_window_session" -> { (s, d) =>
      val df = ev(s, d).withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      graft.streaming.ChangeFeed.sessionAgg(df, "ets", "6 hours", "1 hour",
          Seq("user_id"))
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          unix_micros(col("session_end")).as("session_end_us"),
          col("n_events"))
        .orderBy("user_id", "session_start_us")
    },
    // OPTIMIZE-analog round trip: fragmented write → compactHead → the
    // bin-packed head revision serves the identical content (oracle reads
    // the source table the snapshot was derived from)
    "t_compact_read" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-compact")
        .toString + "/tbl"
      val src = t(s, d, "orders").select(
        col("o_orderkey").as("node_key"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.TemporalTable.write(src.repartition(24), p)
      val compacted = graft.sources.TemporalTable.compactHead(
        s, p, targetFileBytes = 1L << 40)
      require(compacted.contains(2), s"head did not compact: $compacted")
      graft.sources.TemporalTable.read(s, p)
        .select(col("node_key"), col("o_totalprice"), col("o_orderstatus"),
          col("revision"))
        .orderBy("node_key")
    },
    // revertTo (reference api/NodeTrx.java:50): revert commits the OLD
    // snapshot forward as a new revision — history immutable, head
    // content = revision 1's. The oracle recomputes revision 1 from the
    // source table with the post-revert head revision number
    "t_revert" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-revert")
        .toString + "/tbl"
      val src = t(s, d, "orders").select(
        col("o_orderkey").as("node_key"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.TemporalTable.write(src, p)
      graft.sources.TemporalTable.write(
        src.filter(col("o_orderstatus") === "O")
          .withColumn("o_totalprice", col("o_totalprice") * 2), p)
      val newRev = graft.sources.TemporalTable.revert(s, p, 1)
      require(newRev == 3, s"revert committed revision $newRev")
      graft.sources.TemporalTable.read(s, p)
        .select(col("node_key"), col("o_totalprice"), col("o_orderstatus"),
          col("revision"))
        .orderBy("node_key")
    },
    // RECORD_TO_REVISIONS lookup (reference index/IndexType.java:24-27,
    // RecordRevisionsLookup.java) through the commit-maintained
    // `_keyindex` sidecars: three revisions with known key predicates,
    // four probe keys whose revision sets the oracle re-derives
    // relationally from the source table
    "t_record_revisions" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-recrev")
        .toString + "/tbl"
      val src = t(s, d, "orders").select(
        col("o_orderkey").as("node_key"), col("o_totalprice"))
      graft.sources.TemporalTable.write(src, p)
      graft.sources.TemporalTable.write(src.filter(col("node_key") % 3 === 0), p)
      graft.sources.TemporalTable.write(src.filter(col("node_key") % 2 === 0), p)
      Seq(4L, 6L, 7L, 9L).map(k =>
          graft.sources.TemporalTable.recordRevisions(s, p, k)
            .select(lit(k).as("node_key"), col("revision")))
        .reduce(_ unionByName _)
        .orderBy("node_key", "revision")
    },
    // SQL time travel through the V2 catalog (jn:doc(db,res,rev) as
    // `VERSION AS OF` — reference Doc.java:31; GraftCatalog maps
    // identifiers to warehouse paths): the flagship cross-revision join
    // written in PLAIN SQL, revision pins validated against the commit
    // log. The oracle recomputes both versions from the source table
    "t_sql_time_travel" -> { (s, d) =>
      val w = java.nio.file.Files.createTempDirectory("graft-sqlcat").toString
      val p = s"$w/db/orders_t"
      val src = t(s, d, "orders").select(
        col("o_orderkey").as("node_key"), col("o_totalprice"))
      graft.sources.TemporalTable.write(src, p)
      graft.sources.TemporalTable.write(
        src.withColumn("o_totalprice", col("o_totalprice") * 2), p)
      s.conf.set("spark.sql.catalog.gverify",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gverify.warehouse", w)
      s.sql("""SELECT node_key, v1.o_totalprice AS price_v1,
              |  v2.o_totalprice AS price_v2
              |FROM gverify.db.orders_t VERSION AS OF 1 v1
              |JOIN gverify.db.orders_t VERSION AS OF 2 v2 USING (node_key)
              |ORDER BY node_key""".stripMargin)
    },
    // in-place HISTORICAL compaction round trip: fragmented old revision →
    // RevisionCompaction (same revision number, originals vacuumed) → the
    // full history frame still serves both revisions' exact content from
    // the commit-log manifest index (oracle recomputes both snapshots from
    // the source table)
    "t_compact_history" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-compact-hist")
        .toString + "/tbl"
      val src = t(s, d, "orders").select(
        col("o_orderkey").as("node_key"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.TemporalTable.write(src.repartition(24), p)
      // rev 2 keeps only open orders, re-priced
      graft.sources.TemporalTable.write(
        src.filter(col("o_orderstatus") === "O")
          .withColumn("o_totalprice", col("o_totalprice") * 2).repartition(12), p)
      val gen = graft.sources.RevisionCompaction.compactRevision(
        s, p, 1, targetFileBytes = 1L << 40)
      require(gen.contains(1), s"revision 1 did not compact: $gen")
      require(graft.sources.MetaIO.listFiles(s"$p/rev=1").isEmpty,
        "rev=1 originals were not vacuumed — the read below would not prove " +
          "manifest-only visibility")
      graft.sources.TemporalTable.readAllRevisions(s, p)
        .select(col("node_key"), col("o_totalprice"), col("o_orderstatus"),
          col("revision"))
        .orderBy("revision", "node_key")
    },
    // schema evolution across revisions: a later commit adds a column,
    // the history frame serves the union schema with nulls where absent
    // (the reference is schemaless — revisions shape documents freely;
    // SURVEY.md §1.3; recorded per-commit schemas merged at read)
    "t_schema_evolution" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-evolution")
        .toString + "/tbl"
      val src = t(s, d, "orders")
      graft.sources.TemporalTable.write(
        src.select(col("o_orderkey").as("node_key"), col("o_totalprice")), p)
      graft.sources.TemporalTable.write(
        src.select(col("o_orderkey").as("node_key"), col("o_totalprice"),
          col("o_orderstatus")), p)
      graft.sources.TemporalTable.readAllRevisions(s, p)
        .select(col("node_key"), col("o_totalprice"), col("o_orderstatus"),
          col("revision"))
        .orderBy("revision", "node_key")
    },
    // in-place compaction of a DELTA chain: full + delta revisions
    // bin-packed at their own revision numbers, originals vacuumed, and
    // the reconstruction/history read paths still answer through the
    // compaction overlay (SURVEY.md §1.5/§2.14; the reference rewrites
    // delta-versioned pages compact the same way —
    // bundles/sirix-core/src/main/java/io/sirix/settings/VersioningType.java)
    "t_compact_delta" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-compact-delta")
        .toString + "/tbl"
      val src = t(s, d, "orders").select(
        col("o_orderkey").as("node_key"), col("o_totalprice"), col("o_orderstatus"))
      // rev 1 full; rev 2 delta (drops F-status rows); rev 3 delta
      // (re-prices open orders) — snapshotEvery=4 keeps 2-3 as deltas
      val st2 = src.filter(col("o_orderstatus") =!= "F")
      val st3 = st2.withColumn("o_totalprice",
        when(col("o_orderstatus") === "O", col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      graft.sources.DeltaTemporalTable.write(s, src.repartition(8), p,
        keys = Seq("node_key"), snapshotEvery = 4)
      graft.sources.DeltaTemporalTable.write(s, st2, p,
        keys = Seq("node_key"), snapshotEvery = 4)
      graft.sources.DeltaTemporalTable.write(s, st3, p,
        keys = Seq("node_key"), snapshotEvery = 4)
      val done = graft.sources.RevisionCompaction.compactHistory(
        s, p, targetFileBytes = 1L << 40)
      require(done.contains(1), s"full revision 1 did not compact: $done")
      require(graft.sources.MetaIO.listFiles(s"$p/rev=1").isEmpty,
        "rev=1 originals were not vacuumed — the read below would not prove " +
          "overlay-only visibility on the delta reconstruction path")
      graft.sources.DeltaTemporalTable.readAllRevisions(s, p)
        .select(col("node_key"), col("o_totalprice"), col("o_orderstatus"),
          col("revision"))
        .orderBy("revision", "node_key")
    },
    // tumbling-window aggregation on the event-time axis (streaming parity,
    // SURVEY.md §2.12, exercised as a batch query)
    "t_window_tumbling" -> { (s, d) =>
      ev(s, d)
        .withColumn("hour_bucket", expr("ts div 3600000000000"))
        .groupBy("event_type", "hour_bucket")
        .agg(count(lit(1)).as("cnt"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
        .orderBy("event_type", "hour_bucket")
    }
  )

  private val tsT1 = "TIMESTAMP '2024-01-15 00:00:00'"
  private val tsT2 = "TIMESTAMP '2024-01-23 00:00:00'"

  val oracles: Map[String, String] = Map(
    "t_history" ->
      """SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS revision,
        |  event_id, value
        |FROM events ORDER BY user_id, revision""".stripMargin,
    "t_past" ->
      """SELECT user_id, revision, event_id FROM (
        |  SELECT user_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS revision,
        |    event_id
        |  FROM events) WHERE revision < 3 ORDER BY user_id, revision""".stripMargin,
    "t_prev_next" ->
      """SELECT user_id, event_id,
        |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "t_first_last" ->
      """SELECT DISTINCT user_id,
        |  FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_value,
        |  LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value
        |FROM events ORDER BY user_id""".stripMargin,
    "t_existence" ->
      """SELECT user_id, MIN(revision) AS first_existing, MAX(revision) AS last_existing,
        |  COUNT(*) AS n_revisions, MIN(event_id) AS first_event, MAX(event_id) AS last_event
        |FROM (SELECT user_id, event_id,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS revision
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "t_asof" ->
      s"""SELECT user_id, event_id, value FROM (
         |  SELECT user_id, event_id, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events WHERE ts <= $tsT1)
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "t_open_revisions" ->
      s"""SELECT user_id, event_id, value FROM events
         |WHERE ts >= $tsT1 AND ts < $tsT2 ORDER BY event_id""".stripMargin,
    "t_diff_snapshots" ->
      s"""WITH snap_a AS (
         |  SELECT user_id, event_id, value FROM (
         |    SELECT user_id, event_id, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM events WHERE ts <= $tsT1) WHERE rn = 1),
         |snap_b AS (
         |  SELECT user_id, event_id, value FROM (
         |    SELECT user_id, event_id, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM events WHERE ts <= $tsT2) WHERE rn = 1)
         |SELECT COALESCE(a.user_id, b.user_id) AS user_id,
         |  CASE WHEN a.user_id IS NULL THEN 'insert'
         |       WHEN b.user_id IS NULL THEN 'delete'
         |       WHEN a.event_id IS DISTINCT FROM b.event_id
         |         OR a.value IS DISTINCT FROM b.value THEN 'update'
         |       ELSE 'same' END AS change_type,
         |  a.event_id AS old_event_id, b.event_id AS new_event_id,
         |  a.value AS old_value, b.value AS new_value
         |FROM snap_a a FULL OUTER JOIN snap_b b ON a.user_id = b.user_id
         |WHERE NOT (a.user_id IS NOT NULL AND b.user_id IS NOT NULL
         |           AND a.event_id IS NOT DISTINCT FROM b.event_id
         |           AND a.value IS NOT DISTINCT FROM b.value)
         |ORDER BY user_id""".stripMargin,
    "t_valid_intervals" ->
      """SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
        |  LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
        |FROM events ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "t_valid_at" ->
      s"""SELECT user_id, event_id, valid_from_us FROM (
         |  SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
         |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM events)
         |WHERE valid_from_us <= epoch_us($tsT1)
         |  AND (valid_to_us IS NULL OR valid_to_us > epoch_us($tsT1))
         |ORDER BY user_id""".stripMargin,
    "t_valid_at_indexed" ->
      s"""SELECT user_id, event_id, valid_from_us FROM (
         |  SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
         |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM events)
         |WHERE valid_from_us <= epoch_us($tsT1)
         |  AND (valid_to_us IS NULL OR valid_to_us > epoch_us($tsT1))
         |ORDER BY user_id""".stripMargin,
    "t_valid_at_delta" ->
      s"""SELECT user_id, event_id, valid_from_us FROM (
         |  SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
         |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM events)
         |WHERE valid_from_us <= epoch_us($tsT1)
         |  AND (valid_to_us IS NULL OR valid_to_us > epoch_us($tsT1))
         |  AND user_id % 7 <> 0
         |ORDER BY user_id""".stripMargin,
    "t_bitemporal" ->
      s"""SELECT user_id, event_id, valid_from_us FROM (
         |  SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
         |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM events WHERE event_id <= 8000)
         |WHERE valid_from_us <= epoch_us($tsT1)
         |  AND (valid_to_us IS NULL OR valid_to_us > epoch_us($tsT1))
         |ORDER BY user_id""".stripMargin,
    "t_asof_join" ->
      """SELECT p.event_id, p.user_id, p.value, v.value AS asof_value
        |FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "t_interval_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS vf,
        |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
        |  FROM events WHERE user_id < 10),
        |win AS (
        |  SELECT CAST(i AS INTEGER) AS win_id,
        |    1704067200000000 + (i * 5 + 4) * 86400000000 AS wf,
        |    1704067200000000 + (i * 5 + 4) * 86400000000 + 2 * 86400000000 AS wt
        |  FROM UNNEST(range(0, 5)) AS t(i))
        |SELECT user_id, event_id, win_id FROM iv JOIN win
        |  ON iv.vf < win.wt AND win.wf < iv.vt
        |WHERE iv.vt IS NOT NULL
        |ORDER BY user_id, event_id, win_id""".stripMargin,
    "t_window_fn" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
        |    - (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) % 21600) AS win_start,
        |  event_type, COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, event_type ORDER BY win_start, event_type""".stripMargin,
    "t_window_sliding" ->
      """WITH e AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(epoch(ts) AS BIGINT) - (CAST(epoch(ts) AS BIGINT) % 10800) AS s0
        |  FROM events),
        |x AS (
        |  SELECT event_type, v, s0 AS win_start FROM e
        |  UNION ALL
        |  SELECT event_type, v, s0 - 10800 FROM e)
        |SELECT win_start, event_type, COUNT(*) AS cnt,
        |  CAST(SUM(v) AS DOUBLE) AS sum_value
        |FROM x GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    "t_window_session" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts_us,
        |    SUM(CASE WHEN prev IS NULL OR ts_us - prev >= 21600000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, MIN(ts_us) AS session_start_us,
        |  MAX(ts_us) + 21600000000 AS session_end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "t_compact_read" ->
      """SELECT o_orderkey AS node_key, o_totalprice, o_orderstatus,
        |  CAST(2 AS INTEGER) AS revision
        |FROM orders ORDER BY node_key""".stripMargin,
    "t_sql_time_travel" ->
      """SELECT o_orderkey AS node_key, o_totalprice AS price_v1,
        |  o_totalprice * 2 AS price_v2
        |FROM orders ORDER BY node_key""".stripMargin,
    "t_revert" ->
      """SELECT o_orderkey AS node_key, o_totalprice, o_orderstatus,
        |  CAST(3 AS INTEGER) AS revision
        |FROM orders ORDER BY node_key""".stripMargin,
    "t_record_revisions" ->
      """WITH probes AS (SELECT * FROM (VALUES (4), (6), (7), (9)) p(k)),
        |revs AS (
        |  SELECT k, 1 AS revision FROM probes
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = k)
        |  UNION ALL
        |  SELECT k, 2 FROM probes
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = k AND k % 3 = 0)
        |  UNION ALL
        |  SELECT k, 3 FROM probes
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = k AND k % 2 = 0))
        |SELECT CAST(k AS BIGINT) AS node_key, CAST(revision AS INTEGER) AS revision
        |FROM revs ORDER BY node_key, revision""".stripMargin,
    "t_interval_coalesce" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS vf, epoch_us(ts) + 21600000000 AS vt
        |  FROM events),
        |m AS (
        |  SELECT user_id, vf, vt,
        |    MAX(vt) OVER (PARTITION BY user_id ORDER BY vf, vt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |g AS (
        |  SELECT user_id, vf, vt,
        |    SUM(CASE WHEN pmax IS NULL OR vf > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY vf, vt
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m)
        |SELECT user_id, MIN(vf) AS vf, MAX(vt) AS vt
        |FROM g GROUP BY user_id, island ORDER BY user_id, vf""".stripMargin,
    "t_time_weighted" ->
      """WITH iv AS (
        |  SELECT user_id, value, epoch_us(ts) AS vf,
        |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
        |  FROM events)
        |SELECT user_id, CAST(SUM(vt - vf) AS BIGINT) AS total_duration,
        |  ROUND(SUM(value * (vt - vf)) / SUM(vt - vf), 4) AS weighted_avg
        |FROM iv WHERE vt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "t_allen" ->
      """WITH p AS (
        |  SELECT epoch_us(ts) AS a_f, epoch_us(ts) + 21600000000 AS a_t,
        |    LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b_f
        |  FROM events),
        |r AS (
        |  SELECT CASE
        |    WHEN a_t < b_f THEN 'before'
        |    WHEN b_f + 21600000000 < a_f THEN 'after'
        |    WHEN a_t = b_f THEN 'meets'
        |    WHEN b_f + 21600000000 = a_f THEN 'met_by'
        |    WHEN a_f = b_f THEN 'equals'
        |    WHEN a_f < b_f THEN 'overlaps'
        |    ELSE 'overlapped_by' END AS relation
        |  FROM p WHERE b_f IS NOT NULL)
        |SELECT relation, COUNT(*) AS cnt FROM r
        |GROUP BY relation ORDER BY relation""".stripMargin,
    "t_compact_history" ->
      """SELECT * FROM (
        |  SELECT o_orderkey AS node_key, o_totalprice, o_orderstatus,
        |    CAST(1 AS INTEGER) AS revision
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey AS node_key, o_totalprice * 2 AS o_totalprice,
        |    o_orderstatus, CAST(2 AS INTEGER) AS revision
        |  FROM orders WHERE o_orderstatus = 'O'
        |) ORDER BY revision, node_key""".stripMargin,
    "t_schema_evolution" ->
      """SELECT * FROM (
        |  SELECT o_orderkey AS node_key, o_totalprice,
        |    CAST(NULL AS VARCHAR) AS o_orderstatus, CAST(1 AS INTEGER) AS revision
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey AS node_key, o_totalprice, o_orderstatus,
        |    CAST(2 AS INTEGER) AS revision
        |  FROM orders
        |) ORDER BY revision, node_key""".stripMargin,
    "t_compact_delta" ->
      """SELECT * FROM (
        |  SELECT o_orderkey AS node_key, o_totalprice, o_orderstatus,
        |    CAST(1 AS INTEGER) AS revision
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey AS node_key, o_totalprice, o_orderstatus,
        |    CAST(2 AS INTEGER) AS revision
        |  FROM orders WHERE o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey AS node_key,
        |    CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus, CAST(3 AS INTEGER) AS revision
        |  FROM orders WHERE o_orderstatus <> 'F'
        |) ORDER BY revision, node_key""".stripMargin,
    "t_window_tumbling" ->
      """SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_bucket,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type, hour_bucket
        |ORDER BY event_type, hour_bucket""".stripMargin
  )
}
