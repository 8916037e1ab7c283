package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** RECORD_TO_REVISIONS analog (reference: index/IndexType.java:24-27,
  * axis/temporal/RecordRevisionsLookup.java): the `_keyindex/rev=N`
  * sidecars must make a record-revision lookup read ONLY the compact key
  * table at aged-DB revision depth, with the full-history scan kept as a
  * bit-identical fallback. */
class KeyIndexSpec extends SparkSpec {
  import spark.implicits._

  private val nRevs = 120

  /** One table, `nRevs` commits. Revision r contains node 1 (always),
    * node 1000+r (only that revision), and node 2 on even revisions. */
  private lazy val agedTable: String = {
    val p = Files.createTempDirectory("graft-keyidx").resolve("tbl").toString
    (1 to nRevs).foreach { r =>
      val keys = Seq(1L, 1000L + r) ++ (if (r % 2 == 0) Seq(2L) else Nil)
      TemporalTable.write(keys.toDF("node_key"), p, withManifest = false)
    }
    p
  }

  test("aged table: lookup answers from the key index alone") {
    val everywhere = TemporalTable.recordRevisions(spark, agedTable, 1L)
    assert(everywhere.select("revision").as[Int].collect().toSeq == (1 to nRevs))
    // the plan's only file sources are _keyindex sidecars — one compact
    // metadata table, not nRevs full-snapshot scans
    assert(everywhere.inputFiles.nonEmpty)
    assert(everywhere.inputFiles.forall(_.contains("_keyindex")))

    val even = TemporalTable.recordRevisions(spark, agedTable, 2L)
    assert(even.select("revision").as[Int].collect().toSeq ==
      (1 to nRevs).filter(_ % 2 == 0))

    val once = TemporalTable.recordRevisions(spark, agedTable, 1042L)
    assert(once.select("revision").as[Int].collect().toSeq == Seq(42))
    assert(TemporalTable.recordRevisions(spark, agedTable, 999999L).count() == 0)
  }

  test("lookup carries the commit timestamp like the history scan") {
    val viaIndex = TemporalTable.recordRevisions(spark, agedTable, 1042L)
      .select("revision", "commit_ts").collect()
    val viaScan = TemporalTable.readAllRevisions(spark, agedTable)
      .filter($"node_key" === 1042L)
      .select("revision", "commit_ts").collect()
    assert(viaIndex.toSeq == viaScan.toSeq)
  }

  test("incomplete index falls back to the history scan, same answer") {
    val p = Files.createTempDirectory("graft-keyidx-fb").resolve("tbl").toString
    TemporalTable.write(Seq(1L, 2L).toDF("node_key"), p, withManifest = false)
    TemporalTable.write(Seq(1L, 3L).toDF("node_key"), p, withManifest = false)
    TemporalTable.write(Seq(1L).toDF("node_key"), p, withManifest = false)
    // age out one sidecar, as if rev 2 predated the key-index feature
    MetaIO.delete(s"${TemporalTable.keyIndexDir(p)}/rev=2", recursive = true)
    val r = TemporalTable.recordRevisions(spark, p, 3L)
    assert(r.select("revision").as[Int].collect().toSeq == Seq(2))
    assert(r.inputFiles.exists(!_.contains("_keyindex"))) // scan path
  }

  test("compaction answers from one clustered table; later commits union in") {
    val p = Files.createTempDirectory("graft-keyidx-cmp").resolve("tbl").toString
    (1 to 6).foreach { r =>
      TemporalTable.write(Seq(1L, 100L + r).toDF("node_key"), p, withManifest = false)
    }
    val upTo = TemporalTable.compactKeyIndex(spark, p, nFiles = 2)
    assert(upTo == 6)
    assert(TemporalTable.newestKeyIndexCompaction(p).contains(6))
    // covered revisions come from the compaction, not per-rev sidecars
    val hit = TemporalTable.recordRevisions(spark, p, 103L)
    assert(hit.select("revision").as[Int].collect().toSeq == Seq(3))
    assert(hit.inputFiles.forall(_.contains("compact_upto=6")))
    // a post-compaction commit reads its own sidecar on top
    TemporalTable.write(Seq(1L, 103L).toDF("node_key"), p, withManifest = false)
    val both = TemporalTable.recordRevisions(spark, p, 103L)
    assert(both.select("revision").as[Int].collect().toSeq == Seq(3, 7))
    assert(both.inputFiles.exists(_.contains("compact_upto=6")) &&
      both.inputFiles.exists(_.contains("rev=7")))
    // re-compacting covers the tail and removes the superseded compaction
    assert(TemporalTable.compactKeyIndex(spark, p, nFiles = 2) == 7)
    assert(TemporalTable.newestKeyIndexCompaction(p).contains(7))
    assert(!MetaIO.exists(TemporalTable.keyIndexCompactDir(p, 6)))
    assert(TemporalTable.recordRevisions(spark, p, 103L)
      .select("revision").as[Int].collect().toSeq == Seq(3, 7))
  }

  test("a compaction without _SUCCESS is invisible") {
    val p = Files.createTempDirectory("graft-keyidx-abort").resolve("tbl").toString
    TemporalTable.write(Seq(1L).toDF("node_key"), p, withManifest = false)
    TemporalTable.compactKeyIndex(spark, p)
    MetaIO.delete(s"${TemporalTable.keyIndexCompactDir(p, 1)}/_SUCCESS", recursive = false)
    assert(TemporalTable.newestKeyIndexCompaction(p).isEmpty)
    // lookup still green via the per-revision sidecars
    assert(TemporalTable.recordRevisions(spark, p, 1L)
      .select("revision").as[Int].collect().toSeq == Seq(1))
  }

  test("auto-compaction policy keeps lookups at compacted cost with no manual call") {
    val p = Files.createTempDirectory("graft-keyidx-auto").resolve("tbl").toString
    TemporalTable.setKeyIndexAutoCompaction(p, every = 5, nFiles = 2)
    (1 to 5).foreach { r =>
      TemporalTable.write(Seq(1L, 100L + r).toDF("node_key"), p, withManifest = false)
    }
    // the 5th commit triggered compaction covering revisions 1-5
    assert(TemporalTable.newestKeyIndexCompaction(p).contains(5))
    // commits 6-9 accumulate, 10 re-compacts
    (6 to 9).foreach { r =>
      TemporalTable.write(Seq(1L, 100L + r).toDF("node_key"), p, withManifest = false)
    }
    assert(TemporalTable.newestKeyIndexCompaction(p).contains(5))
    TemporalTable.write(Seq(1L, 110L).toDF("node_key"), p, withManifest = false)
    assert(TemporalTable.newestKeyIndexCompaction(p).contains(10))
    // lookups read the compacted table (+ nothing newer exists) and stay
    // correct across the policy's lifetime
    val hits = TemporalTable.recordRevisions(spark, p, 1L)
    assert(hits.select("revision").as[Int].collect().toSeq == (1 to 10))
    assert(hits.inputFiles.forall(_.contains("compact_upto=10")))
    // V2 appends honor the table policy too
    TemporalTable.clearKeyIndexAutoCompaction(p)
    TemporalTable.setKeyIndexAutoCompaction(p, every = 1, nFiles = 2)
    Seq(1L, 111L).toDF("node_key")
      .write.format("graft-temporal").mode("append").save(p)
    assert(TemporalTable.newestKeyIndexCompaction(p).contains(11))
  }

  test("auto-compaction skips silently while sidecars are incomplete") {
    val p = Files.createTempDirectory("graft-keyidx-auto-skip").resolve("tbl").toString
    TemporalTable.setKeyIndexAutoCompaction(p, every = 2)
    TemporalTable.write(Seq(1L).toDF("node_key"), p, withKeyIndex = false)
    TemporalTable.write(Seq(2L).toDF("node_key"), p) // due, but rev 1 has no sidecar
    assert(TemporalTable.newestKeyIndexCompaction(p).isEmpty)
    // lookups still answer via the fallback scan
    assert(TemporalTable.recordRevisions(spark, p, 1L)
      .select("revision").as[Int].collect().toSeq == Seq(1))
  }

  test("withKeyIndex=false writes no sidecar; non-default keyCol scans") {
    val p = Files.createTempDirectory("graft-keyidx-off").resolve("tbl").toString
    TemporalTable.write(Seq((1L, "a")).toDF("node_key", "name"), p,
      withManifest = false, withKeyIndex = false)
    assert(!MetaIO.exists(TemporalTable.keyIndexDir(p)))
    assert(TemporalTable.recordRevisions(spark, p, 1L)
      .select("revision").as[Int].collect().toSeq == Seq(1))
  }
}
