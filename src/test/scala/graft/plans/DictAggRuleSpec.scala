package graft.plans

import graft.SparkSpec
import graft.operators.Dict
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

class DictAggRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-dict").toString + "/t"
    val df = Seq(
      ("eng", "web", 10L), ("eng", "book", 20L), ("fra", "web", 30L),
      ("deu", "web", 40L), ("fra", "book", 50L), ("eng", "web", 60L),
      (null, "web", 70L), ("deu", null, 80L)
    ).toDF("lang", "source", "n")
    Dict.writeEncoded(df, Seq("lang", "source"), d)
    d
  }

  private def read(): DataFrame = spark.read.parquet(dir)

  private def scanFields(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst { case f: FileSourceScanExec => f.requiredSchema.fieldNames.toSeq }
      .getOrElse(Seq.empty)
  }

  test("dict metadata round-trips through the parquet footer") {
    val schema = read().schema
    val code = schema(Dict.codeCol("lang"))
    assert(code.dataType == IntegerType)
    assert(code.metadata.getString(Dict.MetaFor) == "lang")
    // ordered dictionary: code = rank of the value
    assert(code.metadata.getStringArray(Dict.MetaValues).toSeq ==
      Seq("deu", "eng", "fra"))
  }

  test("groupBy on an encoded column aggregates on codes, scans no strings") {
    DictAggRule.install(spark)
    val q = read().groupBy("lang").agg(sum("n").as("s"))
    val aggs = q.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty)
    // every grouping key is the int32 code, never the string
    assert(aggs.forall(_.groupingExpressions.forall(_.dataType == IntegerType)))
    val fields = scanFields(q)
    assert(fields.contains(Dict.codeCol("lang")) && !fields.contains("lang"))
    // values identical to the plain formulation, null group preserved
    val got = q.orderBy(asc_nulls_first("lang")).as[(Option[String], Long)].collect().toSeq
    assert(got == Seq((None, 70L), (Some("deu"), 120L), (Some("eng"), 90L), (Some("fra"), 80L)))
  }

  test("multi-key grouping rewrites every encoded key") {
    DictAggRule.install(spark)
    val q = read().groupBy("lang", "source").count()
    val aggs = q.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.forall(_.groupingExpressions.forall(_.dataType == IntegerType)))
    val fields = scanFields(q)
    assert(!fields.contains("lang") && !fields.contains("source"))
    val plain = read().drop(Dict.codeCol("lang"), Dict.codeCol("source"))
      .groupBy("lang", "source").count()
    assert(q.orderBy(asc_nulls_first("lang"), asc_nulls_first("source")).collect().toSeq ==
      plain.orderBy(asc_nulls_first("lang"), asc_nulls_first("source")).collect().toSeq)
  }

  test("count(DISTINCT) counts codes without decoding") {
    DictAggRule.install(spark)
    val q = read().agg(countDistinct(col("lang")).as("n"))
    assert(!scanFields(q).contains("lang"))
    assert(q.as[Long].head() == 3L) // nulls excluded, like the plain path
  }

  test("filter on a non-dict column stays; aggregate rewrite still fires") {
    DictAggRule.install(spark)
    val q = read().filter(col("n") >= 30L).groupBy("lang").count()
    val fields = scanFields(q)
    // lang never scanned; n still needed by the (unrewritable) filter
    assert(!fields.contains("lang") && fields.contains("n"))
    val got = q.orderBy(asc_nulls_first("lang")).as[(Option[String], Long)].collect().toSeq
    assert(got == Seq((None, 1L), (Some("deu"), 2L), (Some("eng"), 1L), (Some("fra"), 2L)))
  }

  test("string min/max through the decode expression stays correct") {
    DictAggRule.install(spark)
    val q = read().groupBy("lang").agg(min("source").as("lo"), max("source").as("hi"))
    val got = q.orderBy(asc_nulls_first("lang"))
      .as[(Option[String], Option[String], Option[String])].collect().toSeq
    assert(got == Seq(
      (None, Some("web"), Some("web")),
      (Some("deu"), Some("web"), Some("web")), // deu's null source ignored by min/max
      (Some("eng"), Some("book"), Some("web")),
      (Some("fra"), Some("book"), Some("web"))))
  }

  test("equality filter rewrites onto the code column; filter+groupBy scans no strings") {
    DictAggRule.install(spark)
    val q = read().filter(col("source") === "web").groupBy("lang").count()
    val fields = scanFields(q)
    assert(!fields.contains("lang") && !fields.contains("source"),
      s"string column still scanned: $fields")
    val got = q.orderBy(asc_nulls_first("lang")).as[(Option[String], Long)].collect().toSeq
    assert(got == Seq((None, 1L), (Some("deu"), 1L), (Some("eng"), 2L), (Some("fra"), 1L)))
  }

  test("filter on a value absent from the dictionary matches nothing") {
    DictAggRule.install(spark)
    assert(read().filter(col("lang") === "zzz").count() == 0L)
    // three-valued logic preserved: NOT(c = '<absent>') keeps nulls out
    assert(read().filter(!(col("lang") === "zzz")).count() == 7L)
  }

  test("IN-list and null-safe equality rewrite with identical results") {
    DictAggRule.install(spark)
    val in = read().filter(col("lang").isin("eng", "deu", "zzz"))
    assert(!scanFields(in.groupBy("lang").count()).contains("lang"))
    assert(in.count() == 5L)
    assert(read().filter(col("lang") <=> "fra").count() == 2L)
    assert(read().filter(col("lang") <=> "zzz").count() == 0L)
  }

  test("no dict metadata → no rewrite; join of two dict tables doesn't cross wires") {
    DictAggRule.install(spark)
    val plainDir = java.nio.file.Files.createTempDirectory("graft-plain").toString + "/t"
    Seq(("eng", 1L)).toDF("lang", "n").write.parquet(plainDir)
    val plain = spark.read.parquet(plainDir).groupBy("lang").count()
    assert(scanFields(plain).contains("lang")) // untouched
    // grouping the ENCODED table joined to the plain one: only the encoded
    // side's attribute may rewrite, and here the grouping attr comes from
    // the plain side — rule must leave it alone
    val j = spark.read.parquet(plainDir).as("p")
      .join(read().as("e"), Seq("lang"))
      .groupBy(col("p.lang")).count()
    assert(j.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) == Seq(("eng", 3L)))
  }

  test("distinct agg over an EXPRESSION of the column decodes, never hands codes to string functions") {
    DictAggRule.install(spark)
    // lang is a candidate via the grouping; its nested reference inside
    // the distinct substring must decode, not substitute the int code
    val q = read().groupBy("lang")
      .agg(countDistinct(substring(col("lang"), 1, 2)).as("n"))
      .orderBy(asc_nulls_first("lang"))
    assert(q.as[(Option[String], Long)].collect().toSeq ==
      Seq((None, 0L), (Some("deu"), 1L), (Some("eng"), 1L), (Some("fra"), 1L)))
    // bare distinct argument still counts codes (no decode in the plan)
    val bare = read().agg(countDistinct(col("source")).as("n"))
    assert(bare.as[Long].head() == 2L)
  }

  test("value-carrying distinct aggregates decode — only count(distinct) rides the codes") {
    DictAggRule.install(spark)
    // collect_list(DISTINCT c) is isDistinct but NOT cardinality-only:
    // substituting the bare code column returned arrays of int32 codes
    // where the query expects strings
    val q = read().groupBy("source")
      .agg(expr("sort_array(collect_list(DISTINCT lang))").as("langs"))
    val got = q.orderBy(asc_nulls_first("source"))
      .as[(Option[String], Seq[String])].collect().toSeq
    assert(got == Seq(
      (None, Seq("deu")),
      (Some("book"), Seq("eng", "fra")),
      (Some("web"), Seq("deu", "eng", "fra"))), s"got $got")
    // max(DISTINCT) is value-carrying too (EliminateDistinct may strip the
    // flag before this rule — either way the VALUE must be the string)
    assert(read().agg(expr("max(DISTINCT lang)")).as[String].head() == "fra")
    // count(distinct) still folds onto the codes
    val cd = read().groupBy("source").agg(countDistinct(col("lang")).as("d"))
    assert(cd.orderBy(asc_nulls_first("source")).as[(Option[String], Long)]
      .collect().toSeq == Seq((None, 1L), (Some("book"), 2L), (Some("web"), 3L)))
  }

  test("filter above a union of two dict tables must not rewrite (codes differ)") {
    DictAggRule.install(spark)
    val d2 = java.nio.file.Files.createTempDirectory("graft-dict2").toString + "/t"
    // second table's dictionary assigns DIFFERENT codes to the same values
    // ("aaa" sorts before "eng"/"fra", shifting every code by one)
    Dict.writeEncoded(Seq(("aaa", "web", 1L), ("eng", "web", 2L), ("fra", "web", 3L))
      .toDF("lang", "source", "n"), Seq("lang", "source"), d2)
    val u = read().select("lang", "n").union(spark.read.parquet(d2).select("lang", "n"))
    // a nondeterministic leading conjunct keeps the filter above the Union
    val kept = u.filter(rand(7) <= 1.0 && col("lang") === "fra")
      .select("lang").as[String].collect().toSeq
    assert(kept == Seq("fra", "fra", "fra"),
      s"union filter returned $kept — first table's codes applied to the second's rows")
  }

  test("rule is idempotent and encode() guards cardinality") {
    DictAggRule.install(spark)
    DictAggRule.install(spark)
    assert(spark.experimental.extraOptimizations.count(_.isInstanceOf[DictAggRule]) == 1)
    val wide = spark.range(5000).select(col("id").cast("string").as("s"))
    intercept[IllegalArgumentException] {
      Dict.encode(wide, Seq("s"), maxDict = 4096)
    }
  }
}
