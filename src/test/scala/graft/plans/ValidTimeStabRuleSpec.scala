package graft.plans

import graft.SparkSpec
import graft.operators.Intervals
import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ValidTimeStabRuleSpec extends SparkSpec {
  import spark.implicits._

  // deterministic interval set: mixed widths across a 0..20000 axis
  private def intervals = (0 until 400).map { i =>
    val f = (i * 53L) % 19000
    val w = 1L + (i * 7L) % 400
    (i.toLong, f, f + w)
  }.toDF("id", "vf", "vt")

  test("fork node is on the root path of every contained instant") {
    val gran = 16L
    val rows = intervals
      .withColumn("fork", Intervals.forkNode(col("vf"), col("vt"), gran, lit(1L << 20)))
      .select("vf", "vt", "fork").as[(Long, Long, Long)].collect()
    // sample stabs: endpoints and interior points of each interval
    rows.foreach { case (vf, vt, fork) =>
      Seq(vf, vt - 1, (vf + vt) / 2).foreach { ts =>
        assert(Intervals.stabNodes(ts, gran).contains(fork),
          s"fork $fork of [$vf,$vt) missing from stab nodes of $ts")
      }
    }
  }

  test("stab rewrite adds the fork IN-list and prunes the file listing") {
    ValidTimeStabRule.install(spark)
    val p = Files.createTempDirectory("graft-vtidx").resolve("tbl").toString
    val gran = 16L
    Intervals.writeIndexed(intervals, p, "vf", "vt", gran)
    val t = Intervals.readIndexed(spark, p)
    // metadata survives the parquet round-trip (the rule's recognition key)
    assert(t.schema(Intervals.ForkCol).metadata.contains(Intervals.MetaFrom))

    val ts = 9973L
    val stab = t.filter(col("vf") <= ts && col("vt") > ts)
    val optimized = stab.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(e => e.isInstanceOf[In] || e.isInstanceOf[InSet])),
      s"expected fork IN-list in plan:\n$optimized")

    // correctness: identical rows to the unindexed filter
    val expected = intervals.filter(col("vf") <= ts && col("vt") > ts)
      .select("id").as[Long].collect().sorted.toSeq
    val got = stab.select("id").as[Long].collect().sorted.toSeq
    assert(got == expected && got.nonEmpty)

    // file pruning: the scan reads only the matched fork directories
    stab.collect()
    val scans = stab.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val readFiles = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = t.inputFiles.length
    assert(readFiles < totalFiles / 2,
      s"stab should prune most fork partitions: read $readFiles of $totalFiles")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "fork IN-list must reach the partition filters")
  }

  test("open intervals (null valid_to) survive the stab rewrite") {
    ValidTimeStabRule.install(spark)
    val p = Files.createTempDirectory("graft-vtidx-open").resolve("tbl").toString
    // mixed closed + open (currently-valid) intervals
    val iv = Seq((1L, 100L, Some(200L)), (2L, 150L, None), (3L, 300L, Some(400L)),
      (4L, 10L, None)).toDF("id", "vf", "vt")
    Intervals.writeIndexed(iv, p, "vf", "vt", 16L)
    val t = Intervals.readIndexed(spark, p)
    val ts = 180L
    val stab = t.filter(col("vf") <= ts && (col("vt").isNull || col("vt") > ts))
    // id 1 (closed, contains), id 2 and 4 (open, started before ts)
    assert(stab.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    assert(stab.queryExecution.optimizedPlan.expressions
      .exists(_.exists(e => e.isInstanceOf[In] || e.isInstanceOf[InSet])), "stab must still rewrite")
    // a stab PAST the recorded axis max must NOT be fork-pruned: open
    // intervals still contain it but their forks aren't on its root path
    val far = 100000L
    val stabFar = t.filter(col("vf") <= far && (col("vt").isNull || col("vt") > far))
    assert(stabFar.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L),
      "open intervals must survive an out-of-axis stab")
  }

  test("a join with same-named columns on the other side is not mis-pruned") {
    ValidTimeStabRule.install(spark)
    val p = Files.createTempDirectory("graft-vtidx-join").resolve("tbl").toString
    Intervals.writeIndexed(intervals, p, "vf", "vt", 16L)
    val t = Intervals.readIndexed(spark, p)
    // plain side carries its own vf/vt; the stab predicate targets THOSE
    val plain = Seq((10L, 5L, 9000000L)).toDF("pid", "vf", "vt")
    val joined = plain.crossJoin(t.select(col("id"), col("__fork"), col("__fork_part")))
      .filter(plain("vf") <= 9973L && plain("vt") > 9973L)
    // the filter is on the un-indexed side: every indexed row must survive
    assert(joined.count() == 400)
  }

  test("rule leaves non-stab filters and already-constrained plans alone") {
    ValidTimeStabRule.install(spark)
    val p = Files.createTempDirectory("graft-vtidx2").resolve("tbl").toString
    Intervals.writeIndexed(intervals, p, "vf", "vt", 16L)
    val t = Intervals.readIndexed(spark, p)
    // a range (non-stab) predicate: no literal stab instant → untouched
    val range = t.filter(col("vf") <= 100L && col("vt") > 900L)
    val expected = intervals.filter(col("vf") <= 100L && col("vt") > 900L).count()
    assert(range.count() == expected)
    // stab through the null-tolerant validAt shape still rewrites
    val ts = 5000L
    val stabNullable = t.filter(col("vf") <= ts && (col("vt").isNull || col("vt") > ts))
    val exp2 = intervals.filter(col("vf") <= ts && col("vt") > ts)
      .select("id").as[Long].collect().sorted.toSeq
    assert(stabNullable.select("id").as[Long].collect().sorted.toSeq == exp2)
    assert(stabNullable.queryExecution.optimizedPlan.expressions
      .exists(_.exists(e => e.isInstanceOf[In] || e.isInstanceOf[InSet])))
  }
}
