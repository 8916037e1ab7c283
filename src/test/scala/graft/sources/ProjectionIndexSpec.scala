package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class ProjectionIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val p = Files.createTempDirectory("graft-proj").resolve("tbl").toString
    TemporalTable.write(
      Seq((1L, "a", 10.0, "x"), (2L, "b", 20.0, "y")).toDF("node_key", "name", "price", "tag"), p)
    TemporalTable.write(
      Seq((1L, "a", 11.0, "x"), (3L, "c", 30.0, "z")).toDF("node_key", "name", "price", "tag"), p)
    p
  }

  test("create builds the projection for all revisions; read serves it") {
    val p = mkTable()
    ProjectionIndex.create(spark, p, "kp", Seq("node_key", "price"))
    assert(ProjectionIndex.list(p) == Seq(ProjectionIndex.Projection("kp", Seq("node_key", "price"))))
    val r1 = ProjectionIndex.read(spark, p, "kp", Some(1))
    assert(r1.columns.toSeq == Seq("node_key", "price") && r1.count() == 2)
    assert(ProjectionIndex.read(spark, p, "kp").count() == 2) // latest = rev2
  }

  test("maintain is incremental: only new revisions are projected") {
    val p = mkTable()
    ProjectionIndex.create(spark, p, "kp", Seq("node_key", "price"))
    assert(ProjectionIndex.maintain(spark, p, "kp").isEmpty) // up to date
    TemporalTable.write(
      Seq((4L, "d", 40.0, "w")).toDF("node_key", "name", "price", "tag"), p)
    assert(ProjectionIndex.maintain(spark, p, "kp") == Seq(3)) // just the new one
    assert(ProjectionIndex.read(spark, p, "kp", Some(3))
      .as[(Long, Double)].collect().toSeq == Seq((4L, 40.0)))
  }

  test("readAuto falls back to base when the projection is stale for the revision") {
    val p = mkTable()
    ProjectionIndex.create(spark, p, "kp", Seq("node_key", "price"))
    // new revision WITHOUT maintain: projection is stale
    TemporalTable.write(
      Seq((9L, "z", 90.0, "q")).toDF("node_key", "name", "price", "tag"), p)
    val served = ProjectionIndex.readAuto(spark, p, Seq("price"))
    assert(served.inputFiles.forall(_.contains("/rev=")), "stale projection must fall back")
    assert(served.as[Double].collect().sorted.toSeq == Seq(90.0))
    ProjectionIndex.maintain(spark, p, "kp")
    val again = ProjectionIndex.readAuto(spark, p, Seq("price"))
    assert(again.inputFiles.forall(_.contains("/_proj/kp/")), "maintained → served again")
  }

  test("readAuto serves from a covering projection, falls back otherwise") {
    val p = mkTable()
    ProjectionIndex.create(spark, p, "kp", Seq("node_key", "price"))
    val served = ProjectionIndex.readAuto(spark, p, Seq("price"))
    // scan must touch only projection files, not the base snapshot
    assert(served.inputFiles.forall(_.contains("/_proj/kp/")),
      s"expected projection-served scan, got ${served.inputFiles.toSeq}")
    assert(served.as[Double].collect().sorted.toSeq == Seq(11.0, 30.0))
    val fallback = ProjectionIndex.readAuto(spark, p, Seq("node_key", "tag"))
    assert(fallback.inputFiles.forall(_.contains("/rev=")), "fallback reads base")
    assert(fallback.count() == 2)
  }

  test("commit hook keeps projections maintained automatically (ChangeListener)") {
    val p = mkTable()
    ProjectionIndex.create(spark, p, "kp", Seq("node_key", "price"))
    val hook: TemporalTable.CommitHook =
      (path, _) => ProjectionIndex.maintainAll(spark, path)
    TemporalTable.addCommitHook(hook)
    try {
      TemporalTable.write(
        Seq((1L, "a", 12.0, "x"), (4L, "d", 40.0, "w"))
          .toDF("node_key", "name", "price", "tag"), p)
      // revision 3 was projected by the hook — readAuto serves it directly
      val served = ProjectionIndex.readAuto(spark, p, Seq("price"))
      assert(served.inputFiles.forall(_.contains("/_proj/kp/")),
        "hook must have projected the new revision")
      assert(served.as[Double].collect().sorted.toSeq == Seq(12.0, 40.0))
    } finally TemporalTable.removeCommitHook(hook)
  }

  test("catalog round-trips hostile column names; rejects hostile projection names") {
    val p = Files.createTempDirectory("graft-proj").resolve("tbl").toString
    val hostile = Seq("""k"ey]""", "a,b\\c", "line\nbreak")
    TemporalTable.write(
      Seq((1L, 1.0, 2.0)).toDF(hostile: _*), p)
    ProjectionIndex.create(spark, p, "h1", hostile.take(2))
    val listed = ProjectionIndex.list(p)
    assert(listed.map(_.name) == Seq("h1"))
    assert(listed.head.columns == hostile.take(2),
      s"columns must round-trip exactly, got ${listed.head.columns}")
    // name becomes a data-directory path segment → plain identifiers only
    intercept[IllegalArgumentException] {
      ProjectionIndex.create(spark, p, "../escape", Seq(hostile.head))
    }
    // bare ".." matches the char class but resolves UP the tree —
    // maintain would then OVERWRITE the base table's rev=N data
    intercept[IllegalArgumentException] {
      ProjectionIndex.create(spark, p, "..", Seq(hostile.head))
    }
    intercept[IllegalArgumentException] {
      ProjectionIndex.create(spark, p, ".", Seq(hostile.head))
    }
  }

  test("a crashed (partial) projection write is re-projected, never served") {
    val p = java.nio.file.Files.createTempDirectory("graft-proj-partial")
      .resolve("tbl").toString
    TemporalTable.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("node_key", "name", "v"), p)
    ProjectionIndex.create(spark, p, "nv", Seq("node_key", "v"))
    TemporalTable.write(Seq((1L, "a", 9.0)).toDF("node_key", "name", "v"), p)
    // simulate the crash: rev=2's projection dir exists WITHOUT any
    // completion marker (neither ours nor the committer's _SUCCESS)
    val partial = s"$p/_proj/nv/rev=2"
    MetaIO.mkdirs(partial)
    MetaIO.createNew(s"$partial/part-00000.parquet", "torn bytes")
    // readAuto must fall back to the base table, not serve the fragment
    assert(ProjectionIndex.readAuto(spark, p, Seq("node_key", "v"), Some(2))
      .count() == 1)
    // maintain must treat the partial dir as missing and re-project it
    assert(ProjectionIndex.maintain(spark, p, "nv") == Seq(2))
    assert(MetaIO.exists(s"$partial/_graft_projected"))
    assert(ProjectionIndex.read(spark, p, "nv", Some(2)).count() == 1)
  }

  test("completion gating survives a committer that writes no _SUCCESS") {
    // object-store deployments disable marksuccessfuljobs: the projection
    // must gate on its OWN marker, else every revision looks unprojected
    // forever (permanent fallback + O(revisions) rewrite per commit)
    val p = java.nio.file.Files.createTempDirectory("graft-proj-nosucc")
      .resolve("tbl").toString
    TemporalTable.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("node_key", "name", "v"), p)
    val prev = spark.sparkContext.hadoopConfiguration
      .get("mapreduce.fileoutputcommitter.marksuccessfuljobs")
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    try {
      ProjectionIndex.create(spark, p, "nv", Seq("node_key", "v"))
      assert(!MetaIO.exists(s"$p/_proj/nv/rev=1/_SUCCESS"))
      assert(MetaIO.exists(s"$p/_proj/nv/rev=1/_graft_projected"))
      // maintained once — a second maintain finds nothing missing
      assert(ProjectionIndex.maintain(spark, p, "nv").isEmpty)
      // and the projection actually serves
      val plan = ProjectionIndex
        .readAuto(spark, p, Seq("node_key", "v"), Some(1))
        .queryExecution.executedPlan.toString
      assert(plan.contains("_proj"), s"projection not served:\n$plan")
    } finally {
      if (prev == null)
        spark.sparkContext.hadoopConfiguration
          .unset("mapreduce.fileoutputcommitter.marksuccessfuljobs")
      else spark.sparkContext.hadoopConfiguration
        .set("mapreduce.fileoutputcommitter.marksuccessfuljobs", prev)
    }
  }
}
