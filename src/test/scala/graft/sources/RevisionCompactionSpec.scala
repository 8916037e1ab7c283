package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** In-place historical compaction ([[RevisionCompaction]]): old revisions
  * rewritten bin-packed at the same revision number, with manifest-only
  * visibility on every read path — the invariant under test is that NO
  * reader's answer changes across compact + vacuum, even though the
  * original `rev=N/` data files are gone. */
class RevisionCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).resolve("tbl").toString

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("compacted revision serves identical rows on every read path; originals vacuumed") {
    val p = tmp("graft-rc")
    // fragment rev 1 on purpose; rev 2 modifies a subset
    TemporalTable.write(
      (1L to 200L).map(k => (k, s"v$k", k * 10)).toDF("node_key", "name", "score")
        .repartition(16), p)
    TemporalTable.write(
      (1L to 180L).map(k => (k, if (k <= 5) s"w$k" else s"v$k", k * 10))
        .toDF("node_key", "name", "score").repartition(12), p)

    val before1 = rows(TemporalTable.read(spark, p, Some(1)))
    val beforeAll = rows(TemporalTable.readAllRevisions(spark, p)
      .drop("commit_ts"))
    val beforeDiff = rows(TemporalTable.diff(spark, p, 1, 2))
    val beforeV2All = rows(spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p))
    val beforeRec = rows(TemporalTable.recordRevisions(spark, p, 3L)
      .drop("commit_ts"))

    assert(MetaIO.listFiles(s"$p/rev=1").size == 16)
    val gen = RevisionCompaction.compactRevision(spark, p, 1, targetFileBytes = 1L << 40)
    assert(gen.contains(1))

    // originals gone, sidecars and generation intact
    assert(MetaIO.listFiles(s"$p/rev=1").isEmpty, "original data files not vacuumed")
    assert(MetaIO.exists(s"$p/rev=1/_manifest"), "diff manifest must survive vacuum")
    val g1 = RevisionCompaction.genDir(p, 1, 1)
    assert(MetaIO.listFiles(g1).size == 1, "expected one bin-packed file")

    assert(rows(TemporalTable.read(spark, p, Some(1))) == before1)
    assert(rows(TemporalTable.readAllRevisions(spark, p).drop("commit_ts")) == beforeAll)
    assert(rows(TemporalTable.diff(spark, p, 1, 2)) == beforeDiff)
    assert(rows(spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p)) == beforeV2All)
    val v2r1 = spark.read.format("graft-temporal").option("revision", 1).load(p)
    assert(v2r1.count() == 200)
    assert(v2r1.filter($"node_key" === 7L).select("name").as[String].head() == "v7")
    assert(rows(TemporalTable.recordRevisions(spark, p, 3L).drop("commit_ts")) == beforeRec)
  }

  test("second compaction supersedes the first generation and removes it") {
    val p = tmp("graft-rc-gen")
    TemporalTable.write(
      (1L to 100L).map(k => (k, k.toDouble)).toDF("node_key", "v").repartition(8), p)
    TemporalTable.write(Seq((999L, 0.0)).toDF("node_key", "v"), p)

    // gen 1: pack to ~2 files (tiny target), gen 2: pack to 1
    val sz = MetaIO.listFiles(s"$p/rev=1").map(_._2).sum
    val g1 = RevisionCompaction.compactRevision(spark, p, 1, targetFileBytes = sz / 2)
    assert(g1.contains(1))
    val n1 = MetaIO.listFiles(RevisionCompaction.genDir(p, 1, 1)).size
    assert(n1 > 1 && n1 < 8)
    val g2 = RevisionCompaction.compactRevision(spark, p, 1, targetFileBytes = 1L << 40)
    assert(g2.contains(2))
    assert(!MetaIO.exists(RevisionCompaction.genDir(p, 1, 1)), "superseded gen not removed")
    assert(MetaIO.listFiles(RevisionCompaction.genDir(p, 1, 2)).size == 1)
    assert(TemporalTable.read(spark, p, Some(1)).count() == 100)
    // already at target: no-op
    assert(RevisionCompaction.compactRevision(spark, p, 1, 1L << 40).isEmpty)
  }

  test("dict + stats sidecars survive compaction (metadata carried, fold stays live)") {
    val p = tmp("graft-rc-dict")
    val df = (1L to 500L).map(k => (k, s"dept${k % 5}", k))
      .toDF("node_key", "dept", "amount").repartition(10)
    TemporalTable.write(df, p, dictCols = Seq("dept"), withStats = true,
      statsGroupCols = Seq(Seq("dept")))
    TemporalTable.write(df.limit(100), p)

    assert(StatsSidecar.read(s"$p/rev=1").isDefined)
    val gen = RevisionCompaction.compactRevision(spark, p, 1, targetFileBytes = 1L << 40)
    assert(gen.contains(1))
    val gd = RevisionCompaction.genDir(p, 1, 1)
    // stats regenerated over the new files with the same recipe — and FRESH
    val st = StatsSidecar.read(gd)
    assert(st.isDefined, "stats sidecar not carried into the generation dir")
    assert(st.get.groups.keySet.contains(Seq("dept")), "group sections lost")
    val cur = MetaIO.listDataFileStatus(gd, ".parquet")
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
    assert(StatsSidecar.fresh(st.get,
      cur.map { case (n, l, m) => (n, l, m) }), "carried sidecar is stale")
    // dictionary metadata preserved through the rewrite
    val dicts = graft.operators.Dict.dictionariesOf(
      spark.read.parquet(gd).schema)
    assert(dicts.contains("dept") && dicts("dept").length == 5)
    // a later write still seeds its dictionary from the (compacted) prior
    // revision — exercised against the head: compact head in place too
    RevisionCompaction.compactRevision(spark, p, 2, 1L << 40, vacuum = true) match {
      case _ => // head may already be single-file; either way the next write resolves
    }
    val r3 = TemporalTable.write(df.limit(50), p, dictCols = Seq("dept"))
    val d3 = graft.operators.Dict.dictionariesOf(
      spark.read.parquet(RevisionCompaction.effectiveDir(p, r3)).schema)
    assert(d3("dept").toSeq == dicts("dept").toSeq, "dict codes drifted across compaction")
  }

  test("commit-log stream replays compacted history; file-stream glob refuses") {
    val p = tmp("graft-rc-stream")
    TemporalTable.write(
      (1L to 50L).map(k => (k, k * 2)).toDF("node_key", "v").repartition(6), p)
    TemporalTable.write(Seq((51L, 102L)).toDF("node_key", "v"), p)
    assert(RevisionCompaction.compactRevision(spark, p, 1, 1L << 40).contains(1))

    // a NEW commit stream replaying from scratch must see revision 1's rows
    val out = Files.createTempDirectory("graft-rc-sink").toString
    val q = graft.streaming.ChangeFeed.streamCommits(spark, p)
      .writeStream.format("memory").queryName("rc_replay")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("rc_replay").select($"node_key", $"v", $"rev")
      .as[(Long, Long, Int)].collect().toSet
    assert(got.size == 51, s"expected 51 rows, got ${got.size}")
    assert(got.contains((1L, 2L, 1)) && got.contains((51L, 102L, 2)))

    val e = intercept[IllegalArgumentException] {
      graft.streaming.ChangeFeed.streamTable(spark, p)
    }
    assert(e.getMessage.contains("streamCommits"))
  }

  test("compactHistory packs all pre-head revisions") {
    val p = tmp("graft-rc-hist")
    (1 to 3).foreach { i =>
      TemporalTable.write(
        (1L to 60L).map(k => (k, i.toLong * k)).toDF("node_key", "v").repartition(5), p)
    }
    val done = RevisionCompaction.compactHistory(spark, p, targetFileBytes = 1L << 40)
    assert(done.keySet == Set(1, 2), s"expected pre-head revisions, got $done")
    assert(MetaIO.listFiles(s"$p/rev=3").size == 5, "head must not be rewritten by default")
    (1 to 3).foreach { r =>
      assert(TemporalTable.read(spark, p, Some(r)).count() == 60)
    }
    // history read plans from the manifest index and matches per-rev reads
    val hist = TemporalTable.readAllRevisions(spark, p)
    assert(hist.count() == 180)
    assert(hist.filter($"revision" === 1).select(functions.sum("v"))
      .as[Long].head() == (1L to 60L).sum)

  }

  test("delta chain compacts in place: every read path identical, originals vacuumed") {
    val p = tmp("graft-rc-deltachain")
    // five logical snapshots → rev1 full, rev2-3 deltas, rev4 full
    // (cadence), rev5 delta; inserts/updates/deletes between them
    def state(i: Int) = (1L to 100L)
      .filterNot(k => i >= 3 && k <= 10) // deletes from snapshot 3 on
      .map(k => (k, if (k % 7 == 0) i.toDouble * k else k.toDouble))
      .toDF("node_key", "price")
    (1 to 5).foreach { i =>
      DeltaTemporalTable.write(spark, state(i).repartition(7), p,
        keys = Seq("node_key"), snapshotEvery = 3)
    }
    assert(DeltaTemporalTable.commits(p).map(_.kind) ==
      Seq("full", "delta", "delta", "full", "delta"))

    val beforeReads = (1 to 5).map(r =>
      rows(DeltaTemporalTable.read(spark, p, Some(r))))
    val beforeAll = rows(DeltaTemporalTable.readAllRevisions(spark, p)
      .drop("commit_ts"))
    val beforeFeed = rows(
      graft.streaming.ChangeFeed.revisionFeed(spark, p))
    val beforeV2 = rows(spark.read.format("graft-temporal")
      .option("revision", 3).load(p))

    // which pre-head revisions are multi-file (fulls are 7-way by
    // construction; a delta diff's fan-out depends on AQE coalescing)
    val multiFile = (1 to 4).filter(r => MetaIO.listFiles(s"$p/rev=$r").size > 1).toSet
    assert(Set(1, 4).subsetOf(multiFile), "fixture: fulls must be fragmented")
    val done = RevisionCompaction.compactHistory(spark, p, targetFileBytes = 1L << 40)
    assert(done.keySet == multiFile, s"got $done, expected $multiFile")
    done.foreach { case (r, g) =>
      assert(MetaIO.listFiles(s"$p/rev=$r").isEmpty, s"rev $r originals not vacuumed")
      assert(MetaIO.listFiles(RevisionCompaction.genDir(p, r, g)).size == 1)
    }

    (1 to 5).foreach { r =>
      assert(rows(DeltaTemporalTable.read(spark, p, Some(r))) == beforeReads(r - 1),
        s"reconstruction changed at revision $r")
    }
    assert(rows(DeltaTemporalTable.readAllRevisions(spark, p)
      .drop("commit_ts")) == beforeAll)
    assert(rows(graft.streaming.ChangeFeed.revisionFeed(spark, p)) == beforeFeed)
    assert(rows(spark.read.format("graft-temporal")
      .option("revision", 3).load(p)) == beforeV2)
    // a fresh commit diffs against the overlay-served predecessor
    DeltaTemporalTable.write(spark, state(6), p,
      keys = Seq("node_key"), snapshotEvery = 3)
    assert(rows(DeltaTemporalTable.read(spark, p)) == rows(state(6)))
  }

  test("cleanOrphans removes crashed-attempt generations, never the live one") {
    val p = tmp("graft-rc-orphan")
    TemporalTable.write(
      (1L to 60L).map(k => (k, k)).toDF("node_key", "v").repartition(4), p)
    TemporalTable.write(Seq((61L, 61L)).toDF("node_key", "v"), p)
    RevisionCompaction.compactRevision(spark, p, 1, targetFileBytes = 1L << 40)
    val before = rows(TemporalTable.read(spark, p, Some(1)))
    // a compactor that crashed before publishing gen 2 leaves an orphan
    MetaIO.mkdirs(s"$p/rev=1/_c2")
    MetaIO.createNew(s"$p/rev=1/_c2/part-junk.parquet", "not parquet")
    val removed = RevisionCompaction.cleanOrphans(p)
    assert(removed == Seq("rev=1/_c2"), s"got $removed")
    assert(!MetaIO.exists(s"$p/rev=1/_c2"))
    assert(MetaIO.exists(RevisionCompaction.genDir(p, 1, 1)), "live gen removed")
    assert(rows(TemporalTable.read(spark, p, Some(1))) == before)
    assert(RevisionCompaction.cleanOrphans(p).isEmpty, "idempotence")
  }

  test("a post-commit policy failure surfaces WITHOUT destroying the committed revision") {
    val p = tmp("graft-rc-policyfail")
    DeltaTemporalTable.write(spark,
      Seq((1L, 1.0)).toDF("node_key", "price"), p, snapshotEvery = 3)
    // corrupt policy: maybeAutoCompact will throw AFTER the next commit
    // is durable — the failure must reach the caller, but the revision
    // must survive (a tripped abort path would delete its data dir and
    // leave a dangling commit entry)
    MetaIO.mkdirs(RevisionCompaction.compactionsDir(p))
    MetaIO.createNew(s"${RevisionCompaction.compactionsDir(p)}/_policy.json",
      """{"olderThan":"not-a-number"}""")
    intercept[Exception] {
      DeltaTemporalTable.write(spark,
        Seq((1L, 2.0)).toDF("node_key", "price"), p, snapshotEvery = 3)
    }
    assert(DeltaTemporalTable.commits(p).map(_.revision) == Seq(1, 2),
      "revision 2 committed before the policy ran — it must exist")
    assert(DeltaTemporalTable.read(spark, p, Some(2))
      .select("price").as[Double].head() == 2.0,
      "committed revision's data must survive the policy failure")
    RevisionCompaction.clearAutoCompaction(p)
    // the chain keeps working once the policy is repaired
    DeltaTemporalTable.write(spark,
      Seq((1L, 3.0)).toDF("node_key", "price"), p, snapshotEvery = 3)
    assert(DeltaTemporalTable.read(spark, p).select("price").as[Double].head() == 3.0)
  }

  test("history() reports commits, effective layout, compaction gen, schema") {
    val p = tmp("graft-rc-history")
    TemporalTable.write(
      (1L to 50L).map(k => (k, k * 2)).toDF("node_key", "v").repartition(4), p,
      author = "alice", message = "load")
    TemporalTable.write(
      (1L to 50L).map(k => (k, k * 2, "x")).toDF("node_key", "v", "tag"), p)
    RevisionCompaction.compactRevision(spark, p, 1, targetFileBytes = 1L << 40)
    val h = TemporalTable.history(spark, p)
      .select("revision", "author", "kind", "n_files", "compaction_gen", "schema_ddl")
      .as[(Int, String, String, Option[Int], Option[Int], Option[String])]
      .collect().toSeq
    assert(h.map(_._1) == Seq(1, 2))
    assert(h.head._2 == "alice" && h.forall(_._3 == "snapshot"))
    // rev 1 compacted to one file at gen 1; rev 2 untouched
    assert(h.head._4.contains(1) && h.head._5.contains(1))
    assert(h(1)._5.isEmpty)
    assert(h.head._6.exists(_.contains("node_key")) &&
      h(1)._6.exists(_.contains("tag")), "recorded schemas must surface")
    // delta layout: kinds surface
    val dp = tmp("graft-rc-history-delta")
    (1 to 3).foreach(i => DeltaTemporalTable.write(spark,
      Seq((1L, i.toDouble)).toDF("node_key", "price"), dp, snapshotEvery = 3))
    assert(TemporalTable.history(spark, dp).select("kind").as[String]
      .collect().toSeq == Seq("full", "delta", "delta"))
  }

  test("auto-compaction policy on a delta chain retires aging revisions per commit") {
    val p = tmp("graft-rc-deltaauto")
    RevisionCompaction.setAutoCompaction(p, olderThan = 1, targetFileBytes = 1L << 40,
      vacuumDelayMs = 0) // eager reclaim: this test pins the packing cadence
    def state(i: Int) = (1L to 30L).map(k => (k, i.toDouble + k))
      .toDF("node_key", "price").repartition(5)
    DeltaTemporalTable.write(spark, state(1), p, snapshotEvery = 3)
    assert(RevisionCompaction.overlays(p).isEmpty, "head must not auto-compact")
    DeltaTemporalTable.write(spark, state(2), p, snapshotEvery = 3)
    assert(RevisionCompaction.overlays(p).keySet == Set(1))
    assert(MetaIO.listFiles(s"$p/rev=1").isEmpty)
    // rev 2 is a delta: the policy packs it when it aged IF it is
    // multi-file (AQE may already have coalesced the diff to one file)
    val rev2Files = MetaIO.listFiles(s"$p/rev=2").size
    DeltaTemporalTable.write(spark, state(3), p, snapshotEvery = 3)
    assert(RevisionCompaction.overlays(p).contains(2) == (rev2Files > 1))
    (1 to 3).foreach(r =>
      assert(DeltaTemporalTable.read(spark, p, Some(r)).count() == 30))
  }

  test("clusterBy re-clusters the rewrite: key-sorted files, identical rows") {
    val p = tmp("graft-rc-cluster")
    TemporalTable.write(
      (1L to 400L).map(k => (k, k * 3)).toDF("node_key", "v")
        .repartition(8), p) // round-robin: keys scattered across files
    TemporalTable.write(Seq((401L, 0L)).toDF("node_key", "v"), p)
    val before = rows(TemporalTable.read(spark, p, Some(1)))
    val sz = MetaIO.listFiles(s"$p/rev=1").map(_._2).sum
    val gen = RevisionCompaction.compactRevision(spark, p, 1,
      targetFileBytes = sz / 3, clusterBy = Seq("node_key"))
    assert(gen.contains(1))
    assert(rows(TemporalTable.read(spark, p, Some(1))) == before)
    // range clustering: per-file key ranges are disjoint, so footer
    // min/max prune a point lookup to one file
    val gd = RevisionCompaction.genDir(p, 1, 1)
    val ranges = MetaIO.listFiles(gd).map { case (n, _) =>
      val f = spark.read.parquet(s"$gd/$n")
        .agg(org.apache.spark.sql.functions.min("node_key"),
          org.apache.spark.sql.functions.max("node_key")).head()
      (f.getLong(0), f.getLong(1))
    }.sortBy(_._1)
    assert(ranges.size > 1)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping key ranges: $ranges")
    }
  }

  test("persisted auto-compaction policy packs aging revisions on commit") {
    val p = tmp("graft-rc-auto")
    RevisionCompaction.setAutoCompaction(p, olderThan = 1, targetFileBytes = 1L << 40,
      vacuumDelayMs = 0) // eager reclaim: this test pins the packing cadence
    def frag(i: Int) = (1L to 40L).map(k => (k, i.toLong * k))
      .toDF("node_key", "v").repartition(6)
    TemporalTable.write(frag(1), p)
    assert(RevisionCompaction.overlays(p).isEmpty, "head must not auto-compact")
    TemporalTable.write(frag(2), p)
    // rev 1 aged past the threshold: the commit packed it in place
    assert(RevisionCompaction.overlays(p).keySet == Set(1))
    assert(MetaIO.listFiles(s"$p/rev=1").isEmpty)
    assert(MetaIO.listFiles(RevisionCompaction.genDir(p, 1, 1)).size == 1)
    // V2 append honors the policy too (it travels with the table)
    frag(3).write.format("graft-temporal").mode("append").save(p)
    assert(RevisionCompaction.overlays(p).keySet == Set(1, 2))
    (1 to 3).foreach(r => assert(TemporalTable.read(spark, p, Some(r)).count() == 40))
    // already-packed history: the policy check is metadata-only and idempotent
    TemporalTable.write(frag(4), p)
    assert(RevisionCompaction.overlays(p)(1).gen == 1, "re-compacted a packed revision")
    RevisionCompaction.clearAutoCompaction(p)
    TemporalTable.write(frag(5), p)
    assert(!RevisionCompaction.overlays(p).contains(4), "cleared policy still fired")
  }

  test("policy vacuum retention: superseded files survive the grace window") {
    val p = tmp("graft-rc-retention")
    // default vacuumDelayMs (10 min): a policy compaction publishes the
    // overlay but must NOT delete the superseded files inline — a reader
    // that planned against the pre-overlay manifest keeps its files
    RevisionCompaction.setAutoCompaction(p, olderThan = 1, targetFileBytes = 1L << 40)
    def frag(i: Int) = (1L to 40L).map(k => (k, i.toLong * k))
      .toDF("node_key", "v").repartition(6)
    TemporalTable.write(frag(1), p)
    val originals = MetaIO.listFiles(s"$p/rev=1").map(_._1).toSet
    assert(originals.size == 6)
    TemporalTable.write(frag(2), p)
    assert(RevisionCompaction.overlays(p).keySet == Set(1), "overlay published")
    assert(MetaIO.listFiles(s"$p/rev=1").map(_._1).toSet == originals,
      "superseded files must survive until the grace window passes")
    // reads resolve through the overlay regardless
    assert(TemporalTable.read(spark, p, Some(1)).count() == 40)
    // grace elapsed (simulated with a zero window): the sweep reclaims
    RevisionCompaction.sweepAgedVacuum(p, graceMs = 0)
    assert(MetaIO.listFiles(s"$p/rev=1").isEmpty, "aged files reclaimed")
    assert(TemporalTable.read(spark, p, Some(1)).count() == 40)
    // idempotent: the marker makes later sweeps metadata-only no-ops
    RevisionCompaction.sweepAgedVacuum(p, graceMs = 0)
    assert(MetaIO.exists(s"${RevisionCompaction.compactionsDir(p)}/00000001-0001.vac"))
  }

  private object functions {
    def sum(c: String) = org.apache.spark.sql.functions.sum(c)
  }
}
