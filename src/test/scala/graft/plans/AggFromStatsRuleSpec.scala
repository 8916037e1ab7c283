package graft.plans

import graft.SparkSpec
import graft.sources.StatsSidecar
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation}
import org.apache.spark.sql.functions._

class AggFromStatsRuleSpec extends SparkSpec {
  import spark.implicits._

  private def rewritten(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    opt.collectFirst { case _: LocalRelation => () }.isDefined &&
      opt.collectFirst { case _: Aggregate => () }.isEmpty
  }

  // v: ints with a null; s: low-cardinality string; d: doubles (no sum stat)
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats").toString + "/t"
    Seq((1L, Some(7), "a", 0.5), (2L, Some(-3), "b", 1.5),
        (3L, Some(99), "a", 2.5), (4L, None, "c", 3.5))
      .toDF("id", "v", "s", "d")
      .repartition(2)
      .write.parquet(d)
    StatsSidecar.write(spark, d, ndvCols = Seq("s", "v"))
    d
  }

  test("unfiltered sum/avg/count/min/max/countDistinct folds to a LocalRelation") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(dir).agg(
      sum("v").as("sv"), avg("v").as("av"), count(lit(1)).as("n"),
      count(col("v")).as("nv"), min("v").as("lo"), max("v").as("hi"),
      countDistinct(col("s")).as("ds"), sum("id").as("si"))
    assert(rewritten(q))
    assert(q.as[(Long, Double, Long, Long, Int, Int, Long, Long)].head() ==
      ((103L, 103.0 / 3, 4L, 3L, -3, 99, 3L, 10L)))
  }

  test("a filter disqualifies the fold, answer still correct") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(dir).filter(col("v") > 0).agg(sum("v").as("sv"))
    assert(!rewritten(q))
    assert(q.as[Long].head() == 106L)
  }

  test("grouped aggregate and unsupported aggregates are untouched") {
    AggFromStatsRule.install(spark)
    val g = spark.read.parquet(dir).groupBy("s").agg(sum("v").as("sv"))
    assert(!rewritten(g))
    // double sum: no sidecar statistic (order-dependent FP) → scan
    val q = spark.read.parquet(dir).agg(sum("d").as("sd"))
    assert(!rewritten(q))
    assert(q.as[Double].head() == 8.0)
  }

  test("ndv not recorded for a column → no fold") {
    AggFromStatsRule.install(spark)
    // d (double) got no ndv at write time (not requested)
    val q = spark.read.parquet(dir).agg(countDistinct(col("d")).as("dd"))
    assert(!rewritten(q))
    assert(q.as[Long].head() == 4L)
  }

  test("stale sidecar (appended file) disables the fold; fresh rewrite re-enables") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-stale").toString + "/t"
    Seq((1L, 10), (2L, 20)).toDF("id", "v").write.parquet(d)
    StatsSidecar.write(spark, d)
    assert(rewritten(spark.read.parquet(d).agg(sum("v").as("sv"))))
    // append behind the sidecar's back
    Seq((3L, 30)).toDF("id", "v").write.mode("append").parquet(d)
    val q = spark.read.parquet(d).agg(sum("v").as("sv"))
    assert(!rewritten(q)) // fingerprint mismatch → scan
    assert(q.as[Long].head() == 60L)
    // rewriting the sidecar restores the fold with the right answer
    StatsSidecar.write(spark, d)
    val q2 = spark.read.parquet(d).agg(sum("v").as("sv"))
    assert(rewritten(q2))
    assert(q2.as[Long].head() == 60L)
  }

  test("all-null column folds to null sum/avg and zero count") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-null").toString + "/t"
    Seq((1L, Option.empty[Int]), (2L, Option.empty[Int])).toDF("id", "v")
      .write.parquet(d)
    StatsSidecar.write(spark, d)
    val q = spark.read.parquet(d).agg(
      sum("v").as("sv"), avg("v").as("av"), count(col("v")).as("nv"))
    assert(rewritten(q))
    assert(q.as[(Option[Long], Option[Double], Long)].head() == ((None, None, 0L)))
  }

  test("folds an unfiltered graft-temporal V2 snapshot carrying a sidecar") {
    AggFromStatsRule.install(spark)
    val p = java.nio.file.Files.createTempDirectory("graft-aggstats-v2")
      .resolve("tbl").toString
    graft.sources.TemporalTable.write(
      Seq((1L, 5L), (2L, 9L)).toDF("node_key", "v"), p)
    graft.sources.TemporalTable.write(
      Seq((1L, 6L), (2L, 9L), (3L, -4L)).toDF("node_key", "v"), p)
    // sidecar for the latest revision's data dir
    StatsSidecar.write(spark, s"$p/rev=2")
    val q = spark.read.format("graft-temporal").load(p)
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(rewritten(q))
    assert(q.as[(Long, Long)].head() == ((11L, 3L)))
  }

  test("grouped aggregate folds from a recorded group section") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-grp").toString + "/t"
    Seq((1L, Some(7), "a"), (2L, Some(-3), "b"), (3L, Some(99), "a"),
        (4L, None, "a"), (5L, Some(4), null))
      .toDF("id", "v", "s").repartition(2).write.parquet(d)
    StatsSidecar.write(spark, d, groupCols = Seq(Seq("s")))
    val q = spark.read.parquet(d).groupBy("s").agg(
      count(lit(1)).as("n"), count(col("v")).as("nv"), sum("v").as("sv"),
      avg("v").as("av"), min("v").as("lo"), max("v").as("hi"),
      count(col("s")).as("ns"))
    assert(rewritten(q))
    val got = q.collect().map(r => (Option(r.getString(0)), r.getLong(1),
      r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
      Option(r.get(4)).map(_.asInstanceOf[Double]),
      Option(r.get(5)).map(_.asInstanceOf[Int]),
      Option(r.get(6)).map(_.asInstanceOf[Int]), r.getLong(7))).toSet
    assert(got == Set(
      (Some("a"), 3L, 2L, Some(106L), Some(53.0), Some(7), Some(99), 3L),
      (Some("b"), 1L, 1L, Some(-3L), Some(-3.0), Some(-3), Some(-3), 1L),
      (None, 1L, 1L, Some(4L), Some(4.0), Some(4), Some(4), 0L)))
  }

  test("multi-column group tuple folds in any grouping order and merges dirs") {
    AggFromStatsRule.install(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-aggstats-grp2").toString
    val d1 = s"$base/r1"; val d2 = s"$base/r2"
    Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3)).toDF("g1", "g2", "v")
      .write.parquet(d1)
    // d2 records the tuple in the OPPOSITE column order and overlaps one value
    Seq(("x", "a", 10), ("z", "b", 20)).toDF("g2", "g1", "v").write.parquet(d2)
    StatsSidecar.write(spark, d1, groupCols = Seq(Seq("g1", "g2")))
    StatsSidecar.write(spark, d2, groupCols = Seq(Seq("g2", "g1")))
    val q = spark.read.parquet(d1, d2).groupBy("g2", "g1")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(rewritten(q))
    assert(q.as[(String, String, Long, Long)].collect().toSet == Set(
      ("x", "a", 11L, 2L), ("y", "a", 2L, 1L), ("x", "b", 3L, 1L),
      ("z", "b", 20L, 1L)))
  }

  test("grouped fold declines: unrecorded tuple, count-distinct, filter") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-grp3").toString + "/t"
    Seq(("a", 1, 5), ("b", 2, 6)).toDF("s", "k", "v").write.parquet(d)
    StatsSidecar.write(spark, d, groupCols = Seq(Seq("s")))
    // tuple (s,k) not recorded
    val q1 = spark.read.parquet(d).groupBy("s", "k").agg(sum("v").as("sv"))
    assert(!rewritten(q1))
    // per-group NDV not recorded
    val q2 = spark.read.parquet(d).groupBy("s").agg(countDistinct(col("v")).as("dv"))
    assert(!rewritten(q2))
    // filter disqualifies
    val q3 = spark.read.parquet(d).filter(col("v") > 5).groupBy("s")
      .agg(count(lit(1)).as("n"))
    assert(!rewritten(q3))
    assert(q3.as[(String, Long)].collect().toSet == Set(("b", 1L)))
  }

  // age/active/dept with nulls in every role; covering tuple recorded
  private lazy val cubeDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-cube").toString + "/t"
    Seq((Some(50), Some(true), Some("a")), (Some(45), Some(false), Some("a")),
        (Some(30), Some(true), Some("b")), (None, Some(true), Some("b")),
        (Some(60), Some(true), None), (Some(41), None, Some("b")))
      .toDF("age", "active", "dept").repartition(2).write.parquet(d)
    StatsSidecar.write(spark, d, groupCols = Seq(Seq("age", "active", "dept")))
    d
  }

  test("filtered ungrouped aggregate folds from a covering group section") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(cubeDir)
      .filter(col("age") > 40 && col("active"))
      .agg(count(lit(1)).as("n"), sum("age").as("sa"), avg("age").as("aa"),
        min("age").as("lo"), max("age").as("hi"))
    assert(rewritten(q))
    assert(q.as[(Long, Long, Double, Int, Int)].head() == ((2L, 110L, 55.0, 50, 60)))
  }

  test("filtered groupBy folds; null groups and null filter values follow SQL") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(cubeDir).filter(col("active"))
      .groupBy("dept").agg(count(lit(1)).as("n"))
    assert(rewritten(q))
    assert(q.collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet ==
      Set((Some("a"), 1L), (Some("b"), 2L), (None, 1L)))
    // IS NULL filter selects exactly the null-active row
    val q2 = spark.read.parquet(cubeDir).filter(col("active").isNull)
      .agg(count(lit(1)).as("n"), sum("age").as("sa"))
    assert(rewritten(q2))
    assert(q2.as[(Long, Long)].head() == ((1L, 41L)))
    // string equality folds too
    val q3 = spark.read.parquet(cubeDir).filter(col("dept") === "b")
      .agg(sum("age").as("sa"), count(lit(1)).as("n"))
    assert(rewritten(q3))
    assert(q3.as[(Long, Long)].head() == ((71L, 3L)))
    // negated equality: NOT(NULL = lit) is NULL → the null-dept row is
    // excluded, exactly as the scan would
    val q4 = spark.read.parquet(cubeDir).filter(col("dept") =!= "b")
      .agg(count(lit(1)).as("n"))
    assert(rewritten(q4))
    assert(q4.as[Long].head() == 2L)
  }

  test("empty filtered selection folds to the one-row 0/NULL answer") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(cubeDir).filter(col("age") > 100)
      .agg(count(lit(1)).as("n"), sum("age").as("sa"), min("age").as("lo"))
    assert(rewritten(q))
    val r = q.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("superset tuple serves a smaller groupBy; extra dims merge away") {
    AggFromStatsRule.install(spark)
    // only (age, active, dept) is recorded — not (dept) alone
    val q = spark.read.parquet(cubeDir).groupBy("dept")
      .agg(count(lit(1)).as("n"), sum("age").as("sa"), count(col("age")).as("na"))
    assert(rewritten(q))
    assert(q.collect().map(r => (Option(r.getString(0)), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))).toSet ==
      Set((Some("a"), 2L, Some(95L), 2L), (Some("b"), 3L, Some(71L), 2L),
        (None, 1L, Some(60L), 1L)))
  }

  test("string range predicate does not fold, answer still correct") {
    AggFromStatsRule.install(spark)
    val q = spark.read.parquet(cubeDir).filter(col("dept") > "a")
      .agg(count(lit(1)).as("n"))
    assert(!rewritten(q))
    assert(q.as[Long].head() == 3L)
  }

  test("group section not recorded above the cardinality bound") {
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-card").toString + "/t"
    spark.range(StatsSidecar.MaxGroupValues + 10)
      .select(col("id"), (col("id") % 7).as("v")).write.parquet(d)
    StatsSidecar.write(spark, d, groupCols = Seq(Seq("id"), Seq("v")))
    val st = StatsSidecar.read(d).get
    assert(!st.groups.contains(Seq("id"))) // 4106 distinct > bound
    assert(st.groups(Seq("v")).size == 7)
  }

  test("stats sidecar is a persisted policy: later writes inherit the recipe") {
    val p = java.nio.file.Files.createTempDirectory("graft-aggstats-pol")
      .resolve("tbl").toString
    graft.sources.TemporalTable.write(
      Seq((1L, 5L, "a"), (2L, 9L, "b")).toDF("node_key", "v", "s"), p,
      withStats = true, statsNdvCols = Seq("s"), statsGroupCols = Seq(Seq("s")))
    // revision 2: a PLAIN API write — no stats arguments
    graft.sources.TemporalTable.write(
      Seq((1L, 6L, "a"), (3L, 2L, "c")).toDF("node_key", "v", "s"), p)
    val st2 = StatsSidecar.read(s"$p/rev=2").get
    assert(st2.cols("s").ndv.contains(2L), "rev 2 must inherit the NDV column")
    assert(st2.groups.contains(Seq("s")), "rev 2 must inherit the group tuple")
    // revision 3: a V2 DataFrame write (the SQL INSERT path) — same policy
    Seq((4L, 7L, "d")).toDF("node_key", "v", "s")
      .write.format("graft-temporal").mode("append").save(p)
    val st3 = StatsSidecar.read(s"$p/rev=3").get
    assert(st3.cols("s").ndv.contains(1L) && st3.groups.contains(Seq("s")),
      "V2 writes must keep the stats policy going")
    // a table that never opted in stays sidecar-less
    val q = java.nio.file.Files.createTempDirectory("graft-aggstats-pol2")
      .resolve("tbl").toString
    graft.sources.TemporalTable.write(Seq((1L, 5L)).toDF("node_key", "v"), q)
    graft.sources.TemporalTable.write(Seq((2L, 6L)).toDF("node_key", "v"), q)
    assert(StatsSidecar.read(s"$q/rev=2").isEmpty)
  }

  test("multi-dir count(distinct) never folds — per-dir NDVs double-count") {
    AggFromStatsRule.install(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-aggstats-ndv2").toString
    val d1 = s"$base/r1"; val d2 = s"$base/r2"
    // overlapping value sets: per-dir NDV 3 + 3, true union NDV 4 — an
    // additive "merge" would answer 6. The rule must refuse, forever.
    Seq(1, 2, 3).toDF("v").write.parquet(d1)
    Seq(2, 3, 4).toDF("v").write.parquet(d2)
    StatsSidecar.write(spark, d1, ndvCols = Seq("v"))
    StatsSidecar.write(spark, d2, ndvCols = Seq("v"))
    val q = spark.read.parquet(d1, d2).agg(countDistinct(col("v")).as("dv"))
    assert(!rewritten(q))
    assert(q.as[Long].head() == 4L)
    // the refusal is the multi-dir condition, not a missing statistic:
    // the same shape folds on a single dir
    val q1 = spark.read.parquet(d1).agg(countDistinct(col("v")).as("dv"))
    assert(rewritten(q1))
    assert(q1.as[Long].head() == 3L)
    // non-NDV aggregates over the same two dirs still merge additively
    val q2 = spark.read.parquet(d1, d2).agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(rewritten(q2))
    assert(q2.as[(Long, Long)].head() == ((15L, 6L)))
  }

  test("count(distinct) folds from sections by token-set UNION, never addition") {
    AggFromStatsRule.install(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-aggstats-ndvsec").toString
    val d1 = s"$base/r1"; val d2 = s"$base/r2"
    // overlapping dept sets: per-dir 2 + 2 distinct, true union 3 — an
    // additive merge would answer 4
    Seq(("a", 1), ("b", 2), ("a", 3)).toDF("dept", "v").write.parquet(d1)
    Seq(("b", 10), ("c", 20)).toDF("dept", "v").write.parquet(d2)
    StatsSidecar.write(spark, d1, groupCols = Seq(Seq("dept")))
    StatsSidecar.write(spark, d2, groupCols = Seq(Seq("dept")))
    val q = spark.read.parquet(d1, d2).agg(countDistinct(col("dept")).as("dd"))
    assert(rewritten(q))
    assert(q.as[Long].head() == 3L)
    // grouped: count(distinct tupleCol) per group from a covering tuple
    val d3 = s"$base/r3"
    Seq(("a", "x", 1), ("a", "x", 2), ("a", "y", 3), ("b", "x", 4), ("b", null, 5))
      .toDF("g", "c", "v").write.parquet(d3)
    StatsSidecar.write(spark, d3, groupCols = Seq(Seq("g", "c")))
    val q2 = spark.read.parquet(d3).groupBy("g")
      .agg(countDistinct(col("c")).as("dc"), count(lit(1)).as("n"))
    assert(rewritten(q2))
    // NULL excluded from count(distinct), exactly as the scan would
    assert(q2.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 2L, 3L), ("b", 1L, 2L)))
    // filtered + distinct: predicate selects entries before the union
    val q3 = spark.read.parquet(d3).filter(col("g") === "a")
      .agg(countDistinct(col("c")).as("dc"))
    assert(rewritten(q3))
    assert(q3.as[Long].head() == 2L)
    // an NDV column OUTSIDE every recorded tuple still refuses
    val q4 = spark.read.parquet(d3).groupBy("g")
      .agg(countDistinct(col("v")).as("dv"))
    assert(!rewritten(q4))
    assert(q4.as[(String, Long)].collect().toSet == Set(("a", 3L), ("b", 2L)))
  }

  test("count(distinct) refuses mixed coverings — a tokenless dir must bail the union") {
    AggFromStatsRule.install(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-aggstats-mixcov").toString
    val d1 = s"$base/r1"; val d2 = s"$base/r2"
    Seq(("a", "x", 1), ("a", "y", 2)).toDF("g", "c", "v").write.parquet(d1)
    Seq(("a", "z", 3), ("a", "x", 4)).toDF("g", "c", "v").write.parquet(d2)
    // r1's sidecar covers (g, c) — carries c tokens; r2 recorded only (g)
    // (the shape a write-time cardinality bound or recipe change leaves
    // behind). A union over r1's tokens alone would answer 2; the true
    // distinct-c under g=a is 3 — the fold must refuse, not undercount.
    StatsSidecar.write(spark, d1, groupCols = Seq(Seq("g", "c")))
    StatsSidecar.write(spark, d2, groupCols = Seq(Seq("g")))
    val q = spark.read.parquet(d1, d2).groupBy("g")
      .agg(countDistinct(col("c")).as("dc"))
    assert(!rewritten(q), "mixed coverings must bail to the scan")
    assert(q.as[(String, Long)].collect().toSet == Set(("a", 3L)))
    // non-NDV aggregates over the same mixed pair still fold fine
    val q2 = spark.read.parquet(d1, d2).groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(rewritten(q2))
    assert(q2.as[(String, Long, Long)].collect().toSet == Set(("a", 4L, 10L)))
  }

  test("per-group NDV of a non-tuple column folds only when entries are groups") {
    AggFromStatsRule.install(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-aggstats-gndv").toString
    val d = s"$base/t"
    // user repeats within and across depts: per-dept distinct user counts
    // are 2 (a: u1,u2), 2 (b: u2,u3) — their SUM (4) ≠ table NDV (3)
    Seq(("a", "u1", 1), ("a", "u1", 2), ("a", "u2", 3),
        ("b", "u2", 4), ("b", "u3", 5))
      .toDF("dept", "user", "v").write.parquet(d)
    StatsSidecar.write(spark, d, ndvCols = Seq("user"),
      groupCols = Seq(Seq("dept"), Seq("dept", "v")))
    // covering == grouping set → per-entry NDV serves
    val q = spark.read.parquet(d).groupBy("dept")
      .agg(countDistinct(col("user")).as("du"), count(lit(1)).as("n"))
    assert(rewritten(q))
    assert(q.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 2L, 3L), ("b", 2L, 2L)))
    // filter on the grouping column drops whole entries — still 1:1
    val q2 = spark.read.parquet(d).filter(col("dept") === "a")
      .groupBy("dept").agg(countDistinct(col("user")).as("du"))
    assert(rewritten(q2))
    assert(q2.as[(String, Long)].head() == (("a", 2L)))
    // merging entries (here: ungrouped over the (dept,v) covering, which
    // survives the v-filter with several entries) would ADD per-group
    // NDVs of a repeating user — must refuse and take the scan
    val q3 = spark.read.parquet(d).filter(col("v") > 0).groupBy()
      .agg(countDistinct(col("user")).as("du"))
    assert(!rewritten(q3))
    assert(q3.as[Long].head() == 3L)
    // multi-dir: entries merge across dirs → refuse
    val d2 = s"$base/t2"
    Seq(("a", "u9", 9)).toDF("dept", "user", "v").write.parquet(d2)
    StatsSidecar.write(spark, d2, ndvCols = Seq("user"), groupCols = Seq(Seq("dept")))
    val q4 = spark.read.parquet(d, d2).groupBy("dept")
      .agg(countDistinct(col("user")).as("du"))
    assert(!rewritten(q4))
    assert(q4.as[(String, Long)].collect().toSet == Set(("a", 3L), ("b", 2L)))
  }

  test("sidecar-less dir pays zero FS probes after the first query") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-noside").toString + "/t"
    Seq((1L, 10), (2L, 20)).toDF("id", "v").write.parquet(d)
    // first query records the absence (one probe, no sidecar found)
    assert(spark.read.parquet(d).agg(sum("v").as("sv")).as[Long].head() == 30L)
    val before = StatsSidecar.probeCount.get()
    (1 to 5).foreach { _ =>
      assert(spark.read.parquet(d).agg(sum("v").as("sv")).as[Long].head() == 30L)
    }
    assert(StatsSidecar.probeCount.get() == before,
      "negative cache must absorb sidecar probes on sidecar-less dirs")
    // a sidecar written in this JVM is visible immediately (invalidation)
    StatsSidecar.write(spark, d)
    val q = spark.read.parquet(d).agg(sum("v").as("sv"))
    assert(rewritten(q))
    assert(q.as[Long].head() == 30L)
  }

  test("TemporalTable.write(withStats=true) folds snapshot and merges history") {
    AggFromStatsRule.install(spark)
    val p = java.nio.file.Files.createTempDirectory("graft-aggstats-ws")
      .resolve("tbl").toString
    graft.sources.TemporalTable.write(
      Seq((1L, 5L), (2L, 9L)).toDF("node_key", "v"), p, withStats = true)
    graft.sources.TemporalTable.write(
      Seq((1L, 6L), (2L, 9L), (3L, -4L)).toDF("node_key", "v"), p,
      withStats = true)
    val snap = spark.read.format("graft-temporal").load(p)
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(rewritten(snap))
    assert(snap.as[(Long, Long)].head() == ((11L, 3L)))
    // all-revisions frame: per-revision sidecars merge additively
    val hist = spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p)
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(hist.as[(Long, Long)].head() == ((25L, 5L)))
    // multi-root V1 read over both revision dirs: the additive merge
    // path, pinned as actually folding
    val multi = spark.read.parquet(s"$p/rev=1", s"$p/rev=2")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"),
        min("v").as("lo"), max("v").as("hi"))
    assert(rewritten(multi))
    assert(multi.as[(Long, Long, Long, Long)].head() == ((25L, 5L, -4L, 9L)))
  }

  test("negated predicates against NULL literals fold with SQL three-valued semantics") {
    AggFromStatsRule.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft-aggstats-notin")
      .toString + "/t"
    Seq((1L, 5, "a"), (2L, 7, "b"), (3L, 9, "a"), (4L, 11, null))
      .toDF("id", "v", "s").repartition(2).write.parquet(d)
    graft.sources.StatsSidecar.write(spark, d, groupCols = Seq(Seq("s")))
    // NOT IN with a NULL element is never TRUE in SQL — the fold admitted
    // every non-null non-matching entry instead (silently inflated count)
    val q1 = spark.read.parquet(d)
      .filter(expr("s NOT IN ('a', NULL)"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(q1.as[(Long, Option[Long])].head() == ((0L, None)))
    // NOT(s = NULL) likewise admits no row
    val q2 = spark.read.parquet(d)
      .filter(expr("NOT (s = NULL)"))
      .agg(count(lit(1)).as("n"))
    assert(q2.as[Long].head() == 0L)
    // and the well-formed negation still folds correctly
    val q3 = spark.read.parquet(d)
      .filter(expr("s NOT IN ('a')"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(rewritten(q3))
    assert(q3.as[(Long, Long)].head() == ((1L, 7L)))
  }

  test("schema-evolved history: fold merges pre-column revisions as all-null; NDV bails") {
    AggFromStatsRule.install(spark)
    val p = java.nio.file.Files.createTempDirectory("graft-aggstats-evo")
      .resolve("tbl").toString
    // revision 1 predates `tag`; revision 2 adds it — the union-schema
    // history serves NULL tag for revision 1's rows
    graft.sources.TemporalTable.write(
      Seq((1L, 10L), (2L, 20L)).toDF("node_key", "v"), p, withStats = true)
    graft.sources.TemporalTable.write(
      Seq((1L, 30L, "x"), (2L, 40L, "y")).toDF("node_key", "v", "tag"), p,
      withStats = true, statsNdvCols = Seq("tag"))
    val hist = spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p)
    // sum/count/min/max over the evolved frame FOLD: the pre-column
    // revision contributes an all-null ColStats (count 0), exactly the
    // union-schema read's semantics
    val q = hist.agg(sum("v").as("sv"), count(lit(1)).as("n"),
      count(col("tag")).as("nt"), min("v").as("lo"), max("v").as("hi"))
    assert(rewritten(q), "evolved history must fold, not bail")
    assert(q.as[(Long, Long, Long, Long, Long)].head() ==
      ((100L, 4L, 2L, 10L, 40L)))
    // NDV across the evolved multi-dir frame stays non-additive → scan
    val ndvQ = hist.agg(countDistinct(col("tag")).as("dt"))
    assert(!rewritten(ndvQ))
    assert(ndvQ.as[Long].head() == 2L)
    // the scan-provided revision axis is in NO sidecar → never folds
    // (an all-null synthesis here would return NULL for max(rev))
    val revCol = hist.columns.find(c => c == "rev" || c == "revision").get
    val revQ = hist.agg(max(revCol).as("mr"))
    assert(!rewritten(revQ))
    assert(revQ.collect().head.getInt(0) == 2)
    // snapshot (single-dir) NDV on the evolved column still folds
    val snap = spark.read.format("graft-temporal").load(p)
      .agg(countDistinct(col("tag")).as("dt"), sum("v").as("sv"))
    assert(rewritten(snap))
    assert(snap.as[(Long, Long)].head() == ((2L, 70L)))
  }
}
