package graft.plans

import graft.SparkSpec
import graft.operators.Dict
import graft.sources.TemporalTable
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import java.nio.file.Files

/** The dict-surrogate layout composes with the versioned table: encode
  * before [[TemporalTable.write]], and every temporal read — latest
  * snapshot, time travel, the V2 `graft-temporal` source — carries the
  * footer dictionaries, so [[DictAggRule]] fires on historical snapshots
  * exactly as on plain parquet. */
class DictTemporalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-dict-tt").resolve("tbl").toString
    val r1 = Seq((1L, "eng", 10L), (2L, "fra", 20L), (3L, "eng", 30L))
      .toDF("node_key", "lang", "n")
    val r2 = Seq((1L, "eng", 11L), (2L, "deu", 20L), (3L, "eng", 30L),
      (4L, "fra", 40L)).toDF("node_key", "lang", "n")
    TemporalTable.write(Dict.encode(r1, Seq("lang")), p)
    TemporalTable.write(Dict.encode(r2, Seq("lang")), p)
    p
  }

  private def intKeyed(df: org.apache.spark.sql.DataFrame): Boolean = {
    val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    aggs.nonEmpty && aggs.forall(_.groupingExpressions.forall(_.dataType == IntegerType))
  }

  test("rule fires on a time-travel read of an encoded revision") {
    DictAggRule.install(spark)
    val q = TemporalTable.read(spark, path, Some(1))
      .groupBy("lang").agg(sum("n").as("s"))
    assert(intKeyed(q), "grouping did not rewrite onto the code column")
    assert(q.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("eng", 40L), ("fra", 20L)))
    // each revision carries ITS OWN dictionary: rev 2 adds 'deu'
    val q2 = TemporalTable.read(spark, path, Some(2))
      .groupBy("lang").count()
    assert(intKeyed(q2))
    assert(q2.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("deu", 1L), ("eng", 2L), ("fra", 1L)))
  }

  test("rule fires through the V2 graft-temporal source") {
    DictAggRule.install(spark)
    val q = spark.read.format("graft-temporal").load(path)
      .groupBy("lang").count()
    assert(q.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("deu", 1L), ("eng", 2L), ("fra", 1L)))
    assert(intKeyed(q), "V2 read path dropped the dictionary metadata")
  }

  // the adversarial probe, pinned: the fixture's two revisions carry
  // CONFLICTING dictionaries (rev1 eng=0/fra=1; rev2 deu=0/eng=1/fra=2),
  // and the resolved schema of a multi-revision scan keeps only one
  // footer's metadata — decoding rev1's codes with rev2's dictionary
  // would silently regroup eng as deu. The rule must detect the per-file
  // disagreement and stay string-keyed, answers unchanged.
  test("drifting per-revision dictionaries: multi-revision reads bail to string keys, stay correct") {
    DictAggRule.install(spark)
    val expected = Seq(("deu", 1L), ("eng", 4L), ("fra", 2L))
    // V2 allRevisions read
    val v2 = spark.read.format("graft-temporal").option("allRevisions", true)
      .load(path).groupBy("lang").count()
    assert(!intKeyed(v2),
      "rewrite fired over files whose dictionaries disagree — silent mis-decode")
    assert(v2.orderBy("lang").as[(String, Long)].collect().toSeq == expected)
    // V1 history frame (readAllRevisions) and a plain read of the root
    val v1 = TemporalTable.readAllRevisions(spark, path)
      .groupBy("lang").count()
    assert(!intKeyed(v1))
    assert(v1.orderBy("lang").as[(String, Long)].collect().toSeq == expected)
    val raw = spark.read.parquet(path).groupBy("lang").count()
    assert(!intKeyed(raw))
    assert(raw.orderBy("lang").as[(String, Long)].collect().toSeq == expected)
    // filters must not map values through a disagreeing dictionary either:
    // 'eng' is code 0 in rev1 but code 1 in rev2
    val f = spark.read.parquet(path).filter($"lang" === "eng")
    assert(f.count() == 4L)
  }

  test("stable dictionaries (write dictCols): codes append-only, rule fires on history frames") {
    DictAggRule.install(spark)
    val p = Files.createTempDirectory("graft-dict-stable").resolve("tbl").toString
    val r1 = Seq((1L, "eng", 10L), (2L, "fra", 20L), (3L, "eng", 30L))
      .toDF("node_key", "lang", "n")
    // rev2 introduces 'deu', which sorts FIRST — an independent dictionary
    // would shift every code; the stable path appends it instead
    val r2 = Seq((1L, "eng", 11L), (2L, "deu", 20L), (3L, "eng", 30L),
      (4L, "fra", 40L)).toDF("node_key", "lang", "n")
    TemporalTable.write(r1, p, dictCols = Seq("lang"))
    TemporalTable.write(r2, p, dictCols = Seq("lang"))
    val d1 = Dict.dictionariesOf(spark.read.parquet(s"$p/rev=1").schema)("lang")
    val d2 = Dict.dictionariesOf(spark.read.parquet(s"$p/rev=2").schema)("lang")
    assert(d1.toSeq == Seq("eng", "fra"))
    assert(d2.toSeq == Seq("eng", "fra", "deu"), "new value must APPEND, not re-sort")
    // multi-revision scan: prefix-compatible dictionaries license the
    // rewrite; decode goes through the LONGEST dictionary. (The V2
    // allRevisions read and the raw root read are pure scans; the
    // readAllRevisions helper joins commit metadata, which the rule's
    // aggregate-above-join guard correctly refuses to rewrite.)
    val q = spark.read.format("graft-temporal").option("allRevisions", true)
      .load(p).groupBy("lang").count()
    assert(intKeyed(q), "prefix-compatible dictionaries should license the rewrite")
    assert(q.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("deu", 1L), ("eng", 4L), ("fra", 2L)))
    val raw = spark.read.parquet(p).groupBy("lang").count()
    assert(intKeyed(raw))
    assert(raw.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("deu", 1L), ("eng", 4L), ("fra", 2L)))
    // the metadata-joined history helper stays correct (string-keyed)
    val hist = TemporalTable.readAllRevisions(spark, p).groupBy("lang").count()
    assert(hist.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("deu", 1L), ("eng", 4L), ("fra", 2L)))
    // single-revision reads still fire and decode correctly at each end
    val q1 = TemporalTable.read(spark, p, Some(1)).groupBy("lang").count()
    assert(intKeyed(q1))
    assert(q1.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("eng", 2L), ("fra", 1L)))
    // equality filter over the history frame maps through stable codes
    assert(spark.read.parquet(p).filter($"lang" === "deu").count() == 1L)
  }
}
