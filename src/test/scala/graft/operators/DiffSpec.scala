package graft.operators

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val r1 = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("node_key", "name", "price")
  private lazy val r2 = Seq(
    (1L, "a", 10.0),   // same
    (2L, "b", 25.0),   // update
    (4L, "d", 40.0)    // insert; 3 deleted
  ).toDF("node_key", "name", "price")

  test("diff classifies insert/delete/update and drops same by default") {
    val d = Diff.diff(r1, r2, Seq("node_key"))
      .select("node_key", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("includeSame keeps unchanged rows") {
    val d = Diff.diff(r1, r2, Seq("node_key"), includeSame = true)
    assert(d.count() == 4)
    assert(d.filter($"change_type" === "same").select("node_key").as[Long].head() == 1L)
  }

  test("old/new values carried per compared column") {
    val u = Diff.diff(r1, r2, Seq("node_key"))
      .filter($"change_type" === "update")
      .select("old_price", "new_price").as[(Double, Double)].head()
    assert(u == (20.0, 25.0))
  }

  test("diff applied to r1 reproduces r2 (FIXTURES.md §3 invariant)") {
    val d = Diff.diff(r1, r2, Seq("node_key"), includeSame = true)
    // reconstruct r2: keep same+update+insert with new values
    val rebuilt = d.filter($"change_type" =!= "delete")
      .select($"node_key", $"new_name".as("name"), $"new_price".as("price"))
    assert(rebuilt.except(r2).count() == 0 && r2.except(rebuilt).count() == 0)
  }

  test("prunedDiff equals plain diff and prunes unchanged buckets") {
    // 5000 rows, 3 changes — the adjacent-revision shape
    val base = (1L to 5000L).map(i => (i, s"n$i", i * 1.0))
    val newSnap = base
      .filterNot(_._1 == 17L)                               // delete 17
      .map(r => if (r._1 == 42L) (42L, "n42", 99.0) else r) // update 42
      .:+((9999L, "new", 1.0))                              // insert 9999
    val r1 = base.toDF("node_key", "name", "price")
    val r2 = newSnap.toDF("node_key", "name", "price")
    val plain = Diff.diff(r1, r2, Seq("node_key"))
      .select("node_key", "change_type").as[(Long, String)].collect().toMap
    val pruned = Diff.prunedDiff(r1, r2, Seq("node_key"), numBuckets = 64)
      .select("node_key", "change_type").as[(Long, String)].collect().toMap
    assert(pruned == plain)
    assert(pruned == Map(17L -> "delete", 42L -> "update", 9999L -> "insert"))
  }

  test("a null shifting between compared columns is detected as update") {
    // xxhash64 skips null children, so (x, null) and (null, x) would hash
    // identically without the interleaved null flags
    val a = Seq((1L, Option("x"), Option.empty[String])).toDF("node_key", "email", "phone")
    val b = Seq((1L, Option.empty[String], Option("x"))).toDF("node_key", "email", "phone")
    val d = Diff.diff(a, b, Seq("node_key"))
      .select("node_key", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "update"))
  }

  test("key-only snapshots diff as pure existence changes") {
    val a = Seq(1L, 2L).toDF("node_key")
    val b = Seq(2L, 3L).toDF("node_key")
    val d = Diff.diff(a, b, Seq("node_key"))
      .select("node_key", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "delete", 3L -> "insert"))
  }

  test("prunedDiff catches changes in buckets with duplicated rows (xor cancellation)") {
    // {A, A, C} vs {B, B, C} in one bucket: xor digests collide, the
    // modular-sum digest must still flag the bucket
    val a = Seq((1L, "A"), (1L, "A"), (2L, "C")).toDF("node_key", "v")
    val b = Seq((1L, "B"), (1L, "B"), (2L, "C")).toDF("node_key", "v")
    val d = Diff.prunedDiff(a, b, Seq("node_key"), numBuckets = 1)
    assert(d.filter($"change_type" === "update").count() > 0)
  }

  test("prunedDiff on identical snapshots is empty (all buckets pruned)") {
    val d = Diff.prunedDiff(r1, r1, Seq("node_key"))
    assert(d.count() == 0)
  }

  test("restricting compare columns narrows update detection") {
    val d = Diff.diff(r1, r2, Seq("node_key"), compare = Seq("name"))
      .select("node_key", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(3L -> "delete", 4L -> "insert")) // price-only change invisible
  }
}
