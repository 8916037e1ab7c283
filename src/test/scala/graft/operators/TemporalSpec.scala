package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // changelog: (node_key, ts, value)
  private lazy val log = Seq(
    (1L, 10L, "a1"), (1L, 20L, "a2"), (1L, 30L, "a3"),
    (2L, 15L, "b1"), (2L, 25L, "b2"),
    (3L, 40L, "c1")
  ).toDF("node_key", "ts", "value")

  test("asHistory assigns dense per-key revisions in ts order") {
    val h = Temporal.asHistory(log, "node_key", Seq("ts"))
    val revs = h.filter($"node_key" === 1L).orderBy("revision")
      .select("revision", "value").as[(Int, String)].collect()
    assert(revs.toSeq == Seq((1, "a1"), (2, "a2"), (3, "a3")))
  }

  test("withPreviousNext = lag/lead along the revision axis") {
    val pn = Temporal.withPreviousNext(log, "node_key", Seq("ts"), Seq("value"))
    val row = pn.filter($"node_key" === 1L && $"ts" === 20L)
      .select("prev_value", "next_value").as[(String, String)].head()
    assert(row == ("a1", "a3"))
    val edge = pn.filter($"node_key" === 3L)
      .select("prev_value", "next_value").as[(Option[String], Option[String])].head()
    assert(edge == (None, None))
  }

  test("firstLast per key") {
    val fl = Temporal.firstLast(log, "node_key", Seq("ts"), "value")
    val m = fl.as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ("a1", "a3") && m(2L) == ("b1", "b2") && m(3L) == ("c1", "c1"))
  }

  test("existenceBounds = first/last revision + count") {
    val h = Temporal.asHistory(log, "node_key", Seq("ts"))
    val b = Temporal.existenceBounds(h, "node_key", "revision")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(b(1L) == (1, 3, 3L) && b(3L) == (1, 1, 1L))
  }

  test("asOf returns the latest row per key at or before ts") {
    val snap = Temporal.asOf(log, "node_key", "ts", "value", lit(22L))
      .select("node_key", "value").as[(Long, String)].collect().toMap
    assert(snap == Map(1L -> "a2", 2L -> "b1")) // key 3 doesn't exist yet
  }

  test("validAt stab == asOf snapshot (interval formulation equivalence)") {
    val stab = Temporal.validAt(
      Temporal.asValidIntervals(log, "node_key", "ts", "value"), lit(22L))
      .select("node_key", "value").as[(Long, String)].collect().toMap
    assert(stab == Map(1L -> "a2", 2L -> "b1"))
  }

  test("openBitemporal: tx restriction then valid stab") {
    // tx axis: only rows with ts <= 20 are "committed"
    val bt = Temporal.openBitemporal(log, "node_key", "ts", "value",
      col("ts") <= 20L, lit(100L))
      .select("node_key", "value").as[(Long, String)].collect().toMap
    assert(bt == Map(1L -> "a2", 2L -> "b1")) // a3/b2/c1 not committed on tx axis
  }

  test("asOfJoin attaches the latest preceding right row per key") {
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"))
      .toDF("sym", "trade_ts", "trade_id")
    val quotes = Seq((1L, 5L, 100.0), (1L, 20L, 105.0), (1L, 30L, 110.0), (2L, 7L, 50.0))
      .toDF("sym", "quote_ts", "px")
    val joined = Temporal.asOfJoin(trades, quotes, "sym", "trade_ts", "quote_ts", Seq("px"))
      .select("trade_id", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(joined == Map(
      "t1" -> Some(100.0),  // quote@5 is latest <= 10
      "t2" -> Some(105.0),  // quote@20 latest <= 25 (not 30)
      "t3" -> None))        // no quote at or before 5 for sym 2
  }

  test("asOfJoin rejects null right timestamps (no phantom matches)") {
    val l = Seq((1L, 5L, "p")).toDF("k", "lts", "tag")
    val r = Seq((1L, Option.empty[Long], 9.0), (1L, Some(99L), 1.0)).toDF("k", "rts", "v")
    val out = Temporal.asOfJoin(l, r, "k", "lts", "rts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].head()
    assert(out == ("p", None)) // null-ts row must not attach; 99 > 5 must not either
  }

  test("asOfJoin: equal timestamps match (right sorts before left); null right values survive") {
    val l = Seq((1L, 10L, "e")).toDF("k", "lts", "tag")
    val r = Seq((1L, 10L, Option.empty[String], 7.0)).toDF("k", "rts", "note", "v")
    val out = Temporal.asOfJoin(l, r, "k", "lts", "rts", Seq("note", "v"))
      .select("tag", "asof_note", "asof_v")
      .as[(String, Option[String], Option[Double])].head()
    assert(out == ("e", None, Some(7.0))) // same right ROW: null note, v=7
  }

  test("asOfJoin resolves right-timestamp ties deterministically") {
    val l = Seq((1L, 10L, "e")).toDF("k", "lts", "tag")
    // three right rows share ts=10 — spread across partitions to provoke
    // arbitrary arrival order; the tie-group MAX payload must win every time
    val r = Seq((1L, 10L, 3.0), (1L, 10L, 9.0), (1L, 10L, 5.0))
      .toDF("k", "rts", "v").repartition(8)
    (1 to 5).foreach { _ =>
      val out = Temporal.asOfJoin(l, r, "k", "lts", "rts", Seq("v"))
        .select("asof_v").as[Double].head()
      assert(out == 9.0, s"tie must resolve to max payload, got $out")
    }
    // explicit tie-break column override
    val r2 = Seq((1L, 10L, "b", 3.0), (1L, 10L, "c", 9.0), (1L, 10L, "a", 5.0))
      .toDF("k", "rts", "pick", "v").repartition(8)
    val out2 = Temporal.asOfJoin(l, r2, "k", "lts", "rts", Seq("pick", "v"),
      rightTieBreak = Some("pick"))
      .select("asof_pick", "asof_v").as[(String, Double)].head()
    assert(out2 == ("c", 9.0)) // max of tie-break column 'pick'
  }

  test("asOfJoin tolerates unorderable (map) payload columns") {
    val l = Seq((1L, 10L, "e")).toDF("k", "lts", "tag")
    val r = Seq((1L, 5L, Map("a" -> "1")))
      .toDF("k", "rts", "attrs")
    val out = Temporal.asOfJoin(l, r, "k", "lts", "rts", Seq("attrs"))
      .select("asof_attrs").as[Map[String, String]].head()
    assert(out == Map("a" -> "1")) // no AnalysisException, payload intact
  }

  test("asOfJoin never matches NULL keys to each other (SQL join semantics)") {
    val left = Seq((Option.empty[Long], 10L, "L1"), (Some(1L), 10L, "L2"))
      .toDF("k", "ts", "tag")
    val right = Seq((Option.empty[Long], 5L, 42.0), (Some(1L), 5L, 7.0))
      .toDF("k", "ts", "v")
    val r = Temporal.asOfJoin(left, right, "k", "ts", "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    // the null-key left row must carry NO right payload — an equi-join
    // (or DuckDB ASOF) would never pair NULL with NULL
    assert(r("L1").isEmpty, s"null keys matched: ${r("L1")}")
    assert(r("L2").contains(7.0))
  }

  test("canonical bitemporal price correction (reference README.md:50-66)") {
    // price recorded $100 valid-from Jan 1 (committed Jan 15), corrected
    // to $95 (committed Jan 20); both valid from the same instant
    val jan1 = 100L; val jan15 = 115L; val jan20 = 120L // day-number axis
    val log = Seq(
      (1L, jan15, jan1, 100.0),
      (1L, jan20, jan1, 95.0)
    ).toDF("node_key", "tx_ts", "valid_from_ts", "price")
    def ask(txUpper: Long): Map[Long, Double] =
      Temporal.openBitemporal(log, "node_key", "valid_from_ts", "tx_ts",
          col("tx_ts") <= txUpper, lit(116L))
        .select("node_key", "price").as[(Long, Double)].collect().toMap
    assert(ask(116L) == Map(1L -> 100.0)) // as known on Jan 16: $100
    assert(ask(121L) == Map(1L -> 95.0))  // as known after correction: $95
  }

  test("past/future filter the revision axis") {
    val h = Temporal.asHistory(log, "node_key", Seq("ts"))
    assert(Temporal.past(h, "revision", 2).filter($"node_key" === 1L).count() == 1)
    assert(Temporal.past(h, "revision", 2, orSelf = true).filter($"node_key" === 1L).count() == 2)
    assert(Temporal.future(h, "revision", 1).filter($"node_key" === 1L).count() == 2)
  }
}
