package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over generated changelogs (SURVEY.md §5 —
  * the reference has none; parity-plus). Uses raw scalacheck generators
  * with fixed seeds (scalatestplus bridge isn't on the classpath). */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val changelogGen: Gen[List[(Long, Long, Int)]] =
    Gen.listOfN(40, for {
      key <- Gen.choose(1L, 6L)
      ts <- Gen.choose(1L, 50L)
      v <- Gen.choose(0, 1000)
    } yield (key, ts, v))

  private def samples(n: Int): Seq[List[(Long, Long, Int)]] =
    (1 to n).flatMap(i =>
      changelogGen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .map(_.distinctBy(r => (r._1, r._2)))  // unique (key, ts) keeps snapshots deterministic
      .filter(_.nonEmpty)

  test("diff(snapA, snapB) applied to snapA reproduces snapB") {
    samples(6).zipWithIndex.foreach { case (rows, i) =>
      val log = rows.toDF("k", "ts", "v")
      val t1 = 10L + i; val t2 = 30L + i
      val a = Temporal.asOf(log, "k", "ts", "v", lit(t1))
      val b = Temporal.asOf(log, "k", "ts", "v", lit(t2))
      val d = Diff.diff(a, b, Seq("k"), includeSame = true)
      val rebuilt = d.filter($"change_type" =!= "delete")
        .select($"k", $"new_ts".as("ts"), $"new_v".as("v"))
      assert(rebuilt.except(b).count() == 0 && b.except(rebuilt).count() == 0,
        s"seed ${i + 1}: diff-apply failed")
    }
  }

  test("asOf == validAt stab at the same instant") {
    samples(6).zipWithIndex.foreach { case (rows, i) =>
      val log = rows.toDF("k", "ts", "v")
      val t = 5L + 7 * i
      val viaAsOf = Temporal.asOf(log, "k", "ts", "v", lit(t)).select("k", "ts", "v")
      val viaStab = Temporal.validAt(
        Temporal.asValidIntervals(log, "k", "ts", "v"), lit(t)).select("k", "ts", "v")
      assert(viaAsOf.except(viaStab).count() == 0 && viaStab.except(viaAsOf).count() == 0,
        s"seed ${i + 1}: asOf/validAt diverged at t=$t")
    }
  }

  test("allTimes cardinality and dense revisions per key") {
    samples(6).foreach { rows =>
      val log = rows.toDF("k", "ts", "v")
      val hist = Temporal.asHistory(log, "k", Seq("ts", "v"))
      val byHist = hist.groupBy("k").count().as[(Long, Long)].collect().toMap
      val byLog = log.groupBy("k").count().as[(Long, Long)].collect().toMap
      assert(byHist == byLog)
      val maxRev = hist.groupBy("k").agg(max("revision").cast("long")).as[(Long, Long)].collect().toMap
      assert(maxRev == byLog) // revisions dense 1..n per key
    }
  }
}
