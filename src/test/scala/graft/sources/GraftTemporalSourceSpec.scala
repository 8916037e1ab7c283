package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class GraftTemporalSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val p = Files.createTempDirectory("graft-v2").resolve("tbl").toString
    TemporalTable.write(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("node_key", "name", "price"), p)
    TemporalTable.write(Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("node_key", "name", "price"), p)
    TemporalTable.write(Seq((1L, "a", 12.0), (3L, "c", 30.0)).toDF("node_key", "name", "price"), p)
    p
  }

  test("format default reads the latest revision") {
    val p = mkTable()
    val df = spark.read.format("graft-temporal").load(p)
    assert(df.count() == 2)
    assert(df.select("rev").distinct().as[Int].head() == 3)
  }

  test("option revision pins a snapshot; asOfTimestampMs resolves via the log") {
    val p = mkTable()
    val r1 = spark.read.format("graft-temporal").option("revision", 1).load(p)
    assert(r1.count() == 2 && r1.select("rev").distinct().as[Int].head() == 1)
    val ts = TemporalTable.commits(p).find(_.revision == 2).get.commitTsMs
    val asOf = spark.read.format("graft-temporal").option("asOfTimestampMs", ts).load(p)
    assert(asOf.select("rev").distinct().as[Int].head() == 2)
  }

  test("allRevisions exposes the rev partition column across history") {
    val p = mkTable()
    val all = spark.read.format("graft-temporal").option("allRevisions", "true").load(p)
    assert(all.count() == 2 + 3 + 2)
    assert(all.select("rev").distinct().as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("filters push down to the parquet scan; rev filter prunes partitions") {
    val p = mkTable()
    val df = spark.read.format("graft-temporal").option("allRevisions", "true").load(p)
      .filter($"price" > 15.0 && $"rev" === 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(price,15.0)"),
      s"expected pushed data filter in:\n$plan")
    // partition filter on rev must NOT appear as a data filter — it prunes dirs
    assert(df.count() == 2) // rev=2 rows with price>15: (2,b,20),(3,c,30)
  }

  test("column pruning reaches the scan") {
    val p = mkTable()
    val df = spark.read.format("graft-temporal").load(p).select("node_key")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<node_key:bigint>"),
      s"expected pruned read schema in:\n$plan")
  }

  test("V2 write appends a new revision with commit-log entry") {
    val p = mkTable() // revisions 1..3
    Seq((7L, "g", 70.0), (8L, "h", 80.0)).toDF("node_key", "name", "price")
      .write.format("graft-temporal").option("author", "writer2")
      .mode("append").save(p)
    assert(TemporalTable.mostRecentRevision(p).contains(4))
    assert(TemporalTable.commits(p).last.author == "writer2")
    val latest = spark.read.format("graft-temporal").load(p)
    assert(latest.select("node_key").as[Long].collect().sorted.toSeq == Seq(7L, 8L))
    // history includes the V2-written revision via partition discovery
    val all = spark.read.format("graft-temporal").option("allRevisions", "true").load(p)
    assert(all.filter($"rev" === 4).count() == 2)
  }

  test("readRevisions single-scan history frame carries commit metadata") {
    val p = mkTable()
    val hist = TemporalTable.readRevisions(spark, p)
    assert(hist.count() == 7)
    assert(hist.columns.toSet == Set("node_key", "name", "price", "revision", "commit_ts", "author"))
    // one scan, no union: plan contains a single parquet source relation
    val scans = "FileScan|BatchScan".r.findAllIn(hist.queryExecution.executedPlan.toString).size
    assert(scans == 1, s"expected single scan, got $scans")
  }

  test("orphan rev dirs (crashed pre-logCommit writers) are invisible to every read") {
    val p = java.nio.file.Files.createTempDirectory("graft-v2-orphan")
      .resolve("tbl").toString
    TemporalTable.write(Seq((1L, "a")).toDF("node_key", "name"), p)
    // a writer materialized rev=2 data but crashed before logCommit —
    // per the commit log this revision never existed
    Seq((99L, "ghost")).toDF("node_key", "name")
      .write.parquet(s"$p/rev=2")
    val hist = spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p)
    assert(hist.count() == 1, "history served an uncommitted revision")
    assert(!hist.select("node_key").as[Long].collect().contains(99L))
    // an explicit pin on the orphan must refuse, like TemporalTable.read
    intercept[IllegalArgumentException] {
      spark.read.format("graft-temporal").option("revision", 2).load(p).count()
    }
  }
}