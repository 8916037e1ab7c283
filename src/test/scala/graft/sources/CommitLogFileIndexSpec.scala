package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import java.nio.file.Files

/** Commit-log-driven file discovery for history reads: [[TemporalTable
  * .logCommit]] records each revision's data-file manifest in its log
  * entry, and [[TemporalTable.readRevisions]] plans the scan from a
  * [[CommitLogFileIndex]] — zero per-revision directory listings. */
class CommitLogFileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def locationOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _) => r.location
    }

  test("history reads plan from the commit log's file manifests") {
    val p = Files.createTempDirectory("graft-clfi").resolve("tbl").toString
    TemporalTable.write(Seq((1L, "a"), (2L, "b")).toDF("node_key", "name"), p)
    TemporalTable.write(Seq((1L, "a2"), (3L, "c")).toDF("node_key", "name"), p)
    // the V2 append path records manifests too
    Seq((4L, "d")).toDF("node_key", "name")
      .write.format("graft-temporal").mode("append").save(p)

    val hist = TemporalTable.readAllRevisions(spark, p)
    val locs = locationOf(hist)
    assert(locs.nonEmpty && locs.forall(_.isInstanceOf[CommitLogFileIndex]),
      s"expected CommitLogFileIndex, got ${locs.map(_.getClass.getSimpleName)}")
    // row parity with per-revision reads
    val byRev = hist.select($"revision", $"node_key", $"name")
      .as[(Int, Long, String)].collect().groupBy(_._1)
    assert(byRev(1).map(t => t._2 -> t._3).toMap == Map(1L -> "a", 2L -> "b"))
    assert(byRev(2).map(t => t._2 -> t._3).toMap == Map(1L -> "a2", 3L -> "c"))
    assert(byRev(3).map(t => t._2 -> t._3).toMap == Map(4L -> "d"))
    // commit metadata still joins in
    assert(hist.columns.contains("commit_ts") && hist.columns.contains("author"))

    // partition pruning flows through the manifest index: a revision
    // filter reaches the scan and drops the other revisions' files
    val pruned = hist.filter($"revision" === 2)
    val scans = pruned.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val selected = scans.head.relation.location
      .listFiles(scans.head.partitionFilters.filter(_.references.nonEmpty), Nil)
    assert(selected.size == 1, s"expected 1 pruned partition, got ${selected.size}")
    assert(pruned.select("node_key").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("pre-manifest commits fall back to the listed read with identical rows") {
    val p = Files.createTempDirectory("graft-clfi-fb").resolve("tbl").toString
    TemporalTable.write(Seq((1L, 1.0)).toDF("node_key", "v"), p)
    TemporalTable.write(Seq((1L, 2.0)).toDF("node_key", "v"), p)
    // strip the files field from one entry, as a pre-upgrade commit
    val dir = TemporalTable.commitsDir(p)
    val name = "00000001.json"
    val stripped = MetaIO.readString(s"$dir/$name")
      .replaceAll(""""files":"[^"]*",""", "")
    MetaIO.delete(s"$dir/$name")
    MetaIO.createNew(s"$dir/$name", stripped)

    val hist = TemporalTable.readAllRevisions(spark, p)
    assert(locationOf(hist).forall(!_.isInstanceOf[CommitLogFileIndex]))
    assert(hist.select($"revision", $"v").as[(Int, Double)].collect().toSet ==
      Set((1, 1.0), (2, 2.0)))
  }

  test("an empty snapshot revision neither breaks planning nor contributes rows") {
    val p = Files.createTempDirectory("graft-clfi-empty").resolve("tbl").toString
    TemporalTable.write(Seq((1L, 1.0)).toDF("node_key", "v"), p)
    TemporalTable.write(Seq.empty[(Long, Double)].toDF("node_key", "v"), p)
    val hist = TemporalTable.readAllRevisions(spark, p)
    assert(hist.select($"revision", $"node_key").as[(Int, Long)].collect().toSeq ==
      Seq((1, 1L)))
  }
}
