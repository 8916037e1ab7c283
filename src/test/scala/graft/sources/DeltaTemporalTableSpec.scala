package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class DeltaTemporalTableSpec extends SparkSpec {
  import spark.implicits._

  private def snap(pairs: (Long, Double)*) =
    pairs.toSeq.toDF("node_key", "price")

  test("full/delta cadence follows snapshotEvery; every revision reconstructs exactly") {
    val p = Files.createTempDirectory("graft-delta").resolve("tbl").toString
    // six logical snapshots with inserts/updates/deletes between them
    val snaps = Seq(
      snap(1L -> 10.0, 2L -> 20.0),
      snap(1L -> 11.0, 2L -> 20.0, 3L -> 30.0),          // upd 1, ins 3
      snap(1L -> 11.0, 3L -> 31.0),                      // del 2, upd 3
      snap(1L -> 11.0, 3L -> 31.0, 4L -> 40.0),          // ins 4
      snap(4L -> 41.0),                                  // del 1,3; upd 4
      snap(4L -> 41.0, 5L -> 50.0))                      // ins 5
    snaps.foreach(s => DeltaTemporalTable.write(spark, s, p, snapshotEvery = 3))

    val kinds = DeltaTemporalTable.commits(p).map(c => c.revision -> c.kind)
    assert(kinds == Seq(1 -> "full", 2 -> "delta", 3 -> "delta",
      4 -> "full", 5 -> "delta", 6 -> "delta"))

    snaps.zipWithIndex.foreach { case (expected, i) =>
      val got = DeltaTemporalTable.read(spark, p, Some(i + 1))
      assert(got.except(expected).count() == 0 && expected.except(got).count() == 0,
        s"revision ${i + 1} did not reconstruct")
    }
    // default read = latest
    assert(DeltaTemporalTable.read(spark, p).count() == 2)
  }

  test("delta revisions store only change records") {
    val p = Files.createTempDirectory("graft-delta2").resolve("tbl").toString
    val big = (1L to 1000L).map(i => i -> i.toDouble)
    DeltaTemporalTable.write(spark, snap(big: _*), p, snapshotEvery = 4)
    // one update + one insert against 1000 rows
    val next = big.toMap ++ Map(5L -> 99.0, 2000L -> 1.0)
    DeltaTemporalTable.write(spark, snap(next.toSeq: _*), p, snapshotEvery = 4)
    val deltaRows = spark.read.parquet(s"$p/rev=2").count()
    assert(deltaRows == 2, s"delta stored $deltaRows rows, expected 2")
    assert(DeltaTemporalTable.read(spark, p, Some(2)).count() == 1001)
  }

  test("V2 reads serve delta layouts via DeltaReconstructRule (latest/revision/asOf)") {
    val p = Files.createTempDirectory("graft-delta-v2").resolve("tbl").toString
    val snaps = Seq(
      snap(1L -> 10.0, 2L -> 20.0),
      snap(1L -> 11.0, 3L -> 30.0),          // upd 1, del 2, ins 3
      snap(1L -> 11.0, 3L -> 31.0, 4L -> 40.0))
    snaps.foreach(s => DeltaTemporalTable.write(spark, s, p, snapshotEvery = 4))
    assert(DeltaTemporalTable.isDeltaLayout(p))

    // latest via the format surface
    val latest = spark.read.format("graft-temporal").load(p)
    assert(latest.columns.toSeq == Seq("node_key", "price"))
    assert(latest.as[(Long, Double)].collect().toMap ==
      Map(1L -> 11.0, 3L -> 31.0, 4L -> 40.0))
    // revision pin reconstructs mid-chain
    val r2 = spark.read.format("graft-temporal").option("revision", 2).load(p)
    assert(r2.as[(Long, Double)].collect().toMap == Map(1L -> 11.0, 3L -> 30.0))
    // predicates and projection survive the rewrite (they reach the
    // underlying parquet scans through the normal optimizer)
    assert(latest.filter($"node_key" === 4L).select("price").as[Double].collect()
      .toSeq == Seq(40.0))
    // count(*) is NOT served from footers on a delta table (change records
    // would overcount) — it must run the reconstruction
    assert(latest.count() == 3)
    // asOf: everything committed so far is before "now"
    val asOf = spark.read.format("graft-temporal")
      .option("asOfTimestampMs", System.currentTimeMillis() + 1000).load(p)
    assert(asOf.count() == 3)
  }

  test("V2 write on a delta table is rejected with a pointer to the delta API") {
    val p = Files.createTempDirectory("graft-delta-v2w").resolve("tbl").toString
    DeltaTemporalTable.write(spark, snap(1L -> 1.0), p)
    val e = intercept[Exception] {
      snap(2L -> 2.0).write.format("graft-temporal").mode("append").save(p)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("DeltaTemporalTable.write"))))
  }

  test("compact materializes the delta chain as a new full snapshot") {
    val p = Files.createTempDirectory("graft-delta4").resolve("tbl").toString
    DeltaTemporalTable.write(spark, snap(1L -> 1.0, 2L -> 2.0), p, snapshotEvery = 9)
    DeltaTemporalTable.write(spark, snap(1L -> 1.5, 3L -> 3.0), p, snapshotEvery = 9)
    val rev = DeltaTemporalTable.compact(spark, p)
    assert(DeltaTemporalTable.commits(p).find(_.revision == rev).get.kind == "full")
    val after = DeltaTemporalTable.read(spark, p)
    assert(after.as[(Long, Double)].collect().toMap == Map(1L -> 1.5, 3L -> 3.0))
    // old revisions remain readable
    assert(DeltaTemporalTable.read(spark, p, Some(1)).count() == 2)
  }

  test("readAllRevisions serves a 100-revision delta chain with a bounded plan") {
    val p = Files.createTempDirectory("graft-delta-hist").resolve("tbl").toString
    // 100 revisions with churn: inserts, updates and periodic deletes
    var state = Map.empty[Long, Double]
    val states = (1 to 100).map { r =>
      state += (r % 7).toLong -> r.toDouble
      if (r % 10 == 0) state -= (r % 3).toLong
      DeltaTemporalTable.write(spark, snap(state.toSeq: _*), p, snapshotEvery = 5)
      state
    }

    val hist = DeltaTemporalTable.readAllRevisions(spark, p)
    // BOUNDED plan: one scan of all fulls + one of all deltas — never a
    // reconstruction leg per revision (the round-5 caveat)
    val scans = hist.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size <= 2, s"expected ≤2 parquet scans, got ${scans.size}")

    // parity: every revision's slice reconstructs the driver-tracked state
    val byRev = hist.select($"revision", $"node_key", $"price")
      .as[(Int, Long, Double)].collect().groupBy(_._1)
    assert(byRev.keySet == (1 to 100).toSet)
    Seq(1, 4, 5, 37, 50, 99, 100).foreach { r =>
      val got = byRev(r).map(t => t._2 -> t._3).toMap
      assert(got == states(r - 1), s"revision $r mismatch")
    }
    assert(hist.count() == states.map(_.size).sum)
    // schema matches the snapshot layout's history frame
    assert(hist.columns.toSeq ==
      Seq("revision", "node_key", "price", "commit_ts", "author"))

    // the full-history change feed over the same chain is equally bounded
    val feed = graft.streaming.ChangeFeed.revisionFeed(spark, p)
    val feedScans = feed.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    // wanted deltas + wanted fulls + prior-epoch fulls + prior-epoch deltas
    assert(feedScans.size <= 4, s"expected ≤4 parquet scans, got ${feedScans.size}")
    // feed replays to exactly the per-revision transitions
    val changes = feed.select($"revision", $"node_key", $"change_type")
      .as[(Int, Long, String)].collect().toSet
    val expected = (1 to 100).flatMap { r =>
      val prev = if (r == 1) Map.empty[Long, Double] else states(r - 2)
      val cur = states(r - 1)
      (cur.keySet -- prev.keySet).map(k => (r, k, "insert")) ++
        (prev.keySet -- cur.keySet).map(k => (r, k, "delete")) ++
        (cur.keySet & prev.keySet).filter(k => cur(k) != prev(k))
          .map(k => (r, k, "update"))
    }.toSet
    assert(changes == expected)
  }

  test("V2 allRevisions read serves the delta history frame") {
    val p = Files.createTempDirectory("graft-delta-v2all").resolve("tbl").toString
    val snaps = Seq(
      snap(1L -> 10.0, 2L -> 20.0),
      snap(1L -> 11.0, 3L -> 30.0),
      snap(1L -> 11.0, 3L -> 31.0, 4L -> 40.0))
    snaps.foreach(s => DeltaTemporalTable.write(spark, s, p, snapshotEvery = 4))
    val all = spark.read.format("graft-temporal").option("allRevisions", true).load(p)
    assert(all.columns.toSeq == Seq("node_key", "price", "rev"))
    assert(all.count() == snaps.map(_.count()).sum)
    // a rev filter slices one reconstructed revision
    assert(all.filter($"rev" === 2).select("node_key", "price")
      .as[(Long, Double)].collect().toMap == Map(1L -> 11.0, 3L -> 30.0))
  }

  test("recordRevisions answers key-presence over the delta chain, one bounded plan") {
    val p = Files.createTempDirectory("graft-delta-rr").resolve("tbl").toString
    // key 5: present rev 1-2, deleted rev 3, re-inserted rev 5
    val states = Seq(
      snap(1L -> 1.0, 5L -> 5.0),
      snap(1L -> 1.0, 5L -> 5.5),
      snap(1L -> 1.0),
      snap(1L -> 1.1),
      snap(1L -> 1.1, 5L -> 9.0))
    states.foreach(s => DeltaTemporalTable.write(spark, s, p, snapshotEvery = 3))
    def revsOf(k: Long) =
      DeltaTemporalTable.recordRevisions(spark, p, k)
        .select("revision").as[Int].collect().toSeq
    assert(revsOf(5L) == Seq(1, 2, 5))
    assert(revsOf(1L) == Seq(1, 2, 3, 4, 5))
    assert(revsOf(99L).isEmpty)
    // the routing facade dispatches delta layouts here
    assert(TemporalTable.recordRevisions(spark, p, 5L)
      .select("revision").as[Int].collect().toSeq == Seq(1, 2, 5))
    // matches the brute-force per-revision reconstruction
    val brute = (1 to 5).filter { r =>
      DeltaTemporalTable.read(spark, p, Some(r))
        .filter($"node_key" === 5L).count() == 1
    }
    assert(revsOf(5L) == brute)
    // the key predicate must reach BOTH parquet legs (pushed beneath the
    // interval window — node_key is a window partition column), so the
    // scans prune by footer min/max instead of reading the chain
    val plan = DeltaTemporalTable.recordRevisions(spark, p, 5L)
      .queryExecution.executedPlan.toString
    val pushed = plan.split('\n')
      .count(l => l.contains("PushedFilters") && l.contains("EqualTo(node_key,5)"))
    assert(pushed >= 2, s"key filter not pushed to both scan legs:\n$plan")
  }

  test("unknown revision and empty table raise") {
    val p = Files.createTempDirectory("graft-delta3").resolve("tbl").toString
    intercept[IllegalArgumentException] { DeltaTemporalTable.read(spark, p) }
    DeltaTemporalTable.write(spark, snap(1L -> 1.0), p)
    intercept[IllegalArgumentException] {
      DeltaTemporalTable.read(spark, p, Some(7))
    }
  }

  test("compactHead refuses a delta layout (change rows are not a snapshot)") {
    val p = Files.createTempDirectory("graft-delta4").resolve("tbl").toString
    DeltaTemporalTable.write(spark, snap(1L -> 1.0, 2L -> 2.0), p, snapshotEvery = 4)
    DeltaTemporalTable.write(spark, snap(1L -> 1.5, 2L -> 2.0), p, snapshotEvery = 4)
    val e = intercept[IllegalArgumentException] {
      TemporalTable.compactHead(spark, p, targetFileBytes = 1L)
    }
    assert(e.getMessage.contains("delta"), e.getMessage)
  }
}
