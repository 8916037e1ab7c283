package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsOrdpathSpec extends SparkSpec {
  import spark.implicits._

  private lazy val a = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 5L, 25L))
    .toDF("id", "vfrom", "vto")
  private lazy val b = Seq((10L, 8L, 12L), (11L, 28L, 40L), (12L, 100L, 110L))
    .toDF("id", "vfrom", "vto")

  test("overlapJoin equals the naive non-equi join, at several bucket widths") {
    val naive = a.as("a").join(b.as("b"),
        col("a.vfrom") < col("b.vto") && col("b.vfrom") < col("a.vto"))
      .select(col("a.id").as("l_id"), col("b.id").as("r_id"))
    for (w <- Seq(1L, 7L, 64L)) {
      val fast = Intervals.overlapJoin(a, b, "vfrom", "vto", w)
        .select("l_id", "r_id")
      assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0,
        s"bucketWidth=$w diverged")
    }
    // expected pairs: 1⋈10 (8<10), 3⋈10, 2⋈11, 3⋈11(28<25? no) → check classic
    val pairs = Intervals.overlapJoin(a, b, "vfrom", "vto", 8L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L), (3L, 10L), (2L, 11L)))
  }

  test("overlapJoin preserves duplicate input rows' multiplicity (no distinct)") {
    val dupA = a.unionByName(a.filter($"id" === 1L)) // row 1 twice
    val res = Intervals.overlapJoin(dupA, b, "vfrom", "vto", 7L)
      .filter($"l_id" === 1L && $"r_id" === 10L)
    assert(res.count() == 2, "duplicate left rows must yield two matches")
  }

  test("overlapJoin: open intervals join with openTo, and fail loud without it") {
    // id 4 is OPEN [15, ∞): it must overlap everything from 15 onward —
    // the silent-drop behavior (sequence(null) → explode emits nothing)
    // made every currently-valid interval vanish from the join
    val withOpen = a.unionByName(
      Seq((4L, 15L, Option.empty[Long])).toDF("id", "vfrom", "vto"))
    val got = Intervals.overlapJoin(withOpen, b, "vfrom", "vto", 8L,
        openTo = Some(200L))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (3L, 10L), (2L, 11L),
      (4L, 11L), (4L, 12L)), s"got $got")
    // closed-only inputs: identical answer with or without openTo
    assert(Intervals.overlapJoin(a, b, "vfrom", "vto", 8L, openTo = Some(200L))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (3L, 10L), (2L, 11L)))
    // without openTo a null end is an ERROR, never a silently dropped row
    intercept[org.apache.spark.SparkThrowable] {
      Intervals.overlapJoin(withOpen, b, "vfrom", "vto", 8L).count()
    }
  }

  test("isFollowingSibling on empty (root) labels is false, not an error") {
    val roots = Seq((1L, Seq.empty[Int]), (2L, Seq.empty[Int])).toDF("id", "pos")
    val n = roots.as("a").join(roots.as("b"),
      Ordpath.isFollowingSibling(col("a.pos"), col("b.pos"))).count()
    assert(n == 0)
  }

  test("stab returns intervals containing the instant, open intervals included") {
    val withOpen = a.unionByName(Seq((4L, 15L, -1L)).toDF("id", "vfrom", "vto")
      .withColumn("vto", lit(null).cast("long")))
    val hit = Intervals.stab(withOpen, "vfrom", "vto", lit(22L))
      .select("id").as[Long].collect().toSet
    assert(hit == Set(2L, 3L, 4L))
  }

  test("relation classifies Allen-style cases") {
    val r = Seq(
      (0L, 5L, 5L, 9L),    // before
      (5L, 9L, 0L, 5L),    // after
      (0L, 9L, 0L, 9L),    // equals
      (2L, 4L, 0L, 9L),    // during
      (0L, 9L, 2L, 4L),    // contains
      (0L, 6L, 4L, 9L)     // overlaps
    ).toDF("af", "at", "bf", "bt")
      .select(Intervals.relation($"af", $"at", $"bf", $"bt").as("rel"))
      .as[String].collect().toSeq
    assert(r == Seq("before", "after", "equals", "during", "contains", "overlaps"))
  }

  private lazy val nodes = Seq(
    (1L, Seq(1)), (2L, Seq(1, 1)), (3L, Seq(1, 1, 3)), (4L, Seq(1, 2)), (5L, Seq(2))
  ).toDF("id", "pos")

  test("ordpath ancestry = array prefix containment") {
    val pairs = nodes.as("a").join(nodes.as("b"),
        Ordpath.isAncestor(col("a.pos"), col("b.pos")))
      .select(col("a.id").as("anc"), col("b.id").as("desc"))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)))
  }

  test("parent and level") {
    val r = nodes.select($"id", Ordpath.parent($"pos").as("par"), Ordpath.level($"pos").as("lvl"))
      .as[(Long, Seq[Int], Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(3L) == (Seq(1, 1), 3) && r(1L) == (Seq.empty[Int], 1))
  }

  test("sibling axes: same parent, ordered by last component") {
    val pairs = nodes.as("a").join(nodes.as("b"),
        Ordpath.isFollowingSibling(col("a.pos"), col("b.pos")))
      .select(col("a.id").as("x"), col("b.id").as("y"))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 4L), (1L, 5L))) // [1,1]→[1,2]; [1]→[2]
  }

  test("path summary: one-pass per-path non-null counts") {
    val df = Seq((1L, Some(1.0), "x"), (2L, None, "y"), (3L, Some(3.0), "z"))
      .toDF("id", "price", "tag")
      .select($"id", struct($"price", struct($"tag").as("meta")).as("doc"))
    val s = PathSummary.of(df).as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s("id") == ("bigint", 3L))
    assert(s("doc.price") == ("double", 2L)) // one null
    assert(s("doc.meta.tag") == ("string", 3L))
    assert(PathSummary.leafPaths(df.schema).map(_._1) ==
      Seq("id", "doc.price", "doc.meta.tag"))
  }

  test("docOrderCmp sorts in pre-order (ancestors first)") {
    val sorted = nodes.as("a").crossJoin(nodes.as("b"))
      .select(col("a.id").as("x"), col("b.id").as("y"),
        Ordpath.docOrderCmp(col("a.pos"), col("b.pos")).as("cmp"))
      .filter($"cmp" < 0).as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2)).toSet
    // expected strict order: 1 < 2 < 3 < 4 < 5
    val expected = (for (x <- 1L to 5L; y <- 1L to 5L if x < y) yield (x, y)).toSet
    assert(sorted == expected)
  }

  test("allen classifies all 13 relations, exactly one per pair") {
    // b is fixed [10, 20); a sweeps every relation
    val cases = Seq(
      (0L, 5L, "before"), (25L, 30L, "after"),
      (5L, 10L, "meets"), (20L, 25L, "met_by"),
      (10L, 20L, "equals"),
      (10L, 15L, "starts"), (10L, 25L, "started_by"),
      (15L, 20L, "finishes"), (5L, 20L, "finished_by"),
      (12L, 18L, "during"), (5L, 25L, "contains"),
      (5L, 15L, "overlaps"), (15L, 25L, "overlapped_by"))
    val df = cases.map { case (f, t, want) => (f, t, want) }
      .toDF("af", "at", "want")
      .withColumn("got", Intervals.allen(col("af"), col("at"), lit(10L), lit(20L)))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
    // totality: the coarse classifier agrees on the summary buckets
    val coarse = df.withColumn("c",
      Intervals.relation(col("af"), col("at"), lit(10L), lit(20L)))
    assert(coarse.filter(col("c") === "before" && col("want") =!= "before"
      && col("want") =!= "meets").isEmpty)
  }

  test("coalesceIntervals merges overlap and half-open adjacency, keeps gaps") {
    val iv = Seq(
      ("u1", 0L, 5L), ("u1", 3L, 8L),   // overlap -> [0,8)
      ("u1", 8L, 12L),                   // adjacent -> [0,12)
      ("u1", 20L, 25L),                  // gap -> own island
      ("u2", 0L, 1L),                    // other key untouched
      ("u1", 21L, 22L)                   // contained -> absorbed
    ).toDF("k", "vf", "vt")
    val got = Intervals.coalesceIntervals(iv, Seq("k"), "vf", "vt")
      .orderBy("k", "vf").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("u1", 0L, 12L), ("u1", 20L, 25L), ("u2", 0L, 1L)))
  }

  test("coalesceIntervals: open (null-end) intervals absorb successors and stay open") {
    val iv = Seq(
      ("u1", 1L, Option.empty[Long]),   // open [1,∞) …
      ("u1", 2L, Some(5L)),             // … absorbs this (max() would skip the null)
      ("u1", 40L, Some(45L)),           // absorbed too: open predecessor
      ("u2", 0L, Some(3L)), ("u2", 10L, None), ("u2", 4L, Some(6L)),
      ("u3", 0L, Some(2L))              // closed key unaffected
    ).toDF("k", "vf", "vt")
    val got = Intervals.coalesceIntervals(iv, Seq("k"), "vf", "vt")
      .orderBy("k", "vf").as[(String, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("u1", 1L, None),                 // ONE island, open end survives
      ("u2", 0L, Some(3L)), ("u2", 4L, Some(6L)), ("u2", 10L, None),
      ("u3", 0L, Some(2L))), s"got $got")
  }

  test("timeWeightedAvg integrates a piecewise-constant signal exactly") {
    // value 2.0 for 10 units, 8.0 for 30 units -> avg = (20+240)/40 = 6.5
    val iv = Seq(("k", 0L, 10L, 2.0), ("k", 10L, 40L, 8.0))
      .toDF("k", "vf", "vt", "v")
    val r = Intervals.timeWeightedAvg(iv, Seq("k"), "vf", "vt", "v")
      .as[(String, Long, Double)].head()
    assert(r == (("k", 40L, 6.5)))
  }
}
