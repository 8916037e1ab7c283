package graft.query

import graft.SparkSpec

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Differential replay of the reference's typed group-by suite
  * (bundles/sirix-query/src/test/java/io/sirix/query/scan/
  * TypedGroupByDifferentialTest.java): the SAME corpus (regenerated with
  * `java.util.Random` under the reference's seeds — JVM PRNG sequences
  * are identical) and the reference's query text VERBATIM through
  * [[JsoniqRun]], checked against an independent in-memory oracle
  * (Jackson-parsed records grouped by value-equality keys).
  *
  * Value-model rules the reference pins and this suite carries:
  *  - typed keys: string / int / boolean / double group without the
  *    "string-only kernel" failure mode (intKeyCanonical etc.);
  *  - MISSING and null are DISTINCT buckets (presentButNullGroupKey);
  *  - numeric keys merge across provenance — 18, 18.0e0, 18.00 are ONE
  *    group (mixedProvenanceIntegralGroupKeysMerge);
  *  - mixed-kind keys group per type (mixedKindGroupKey...);
  *  - `return $t` over the missing bucket emits ZERO items
  *    (countDistinctOverSparseField).
  *
  * One deliberate divergence: multiKeyAbsentFirstKeyFailsLoud pins a
  * brackit interpreter QUIRK (an all-absent FIRST grouping key collapses
  * the grouping to one all-null tuple) that the reference's own
  * vectorized path refuses to reproduce (it fails loudly instead). This
  * engine produces the standard XQuery grouping — per-dept groups with
  * the absent key null — matching the reference's absent-SECOND-key
  * behaviour in either key order. */
class TypedGroupBySpec extends SparkSpec {

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  private val mapper = new ObjectMapper()

  private val Depts = Seq("Eng", "Sales", "Mkt", "Ops")
  private val Cities = Seq("NYC", "LA", "SF")
  private val Tiers = Seq("gold", "silver", "bronze")
  private val N = 1999

  /** TypedGroupByDifferentialTest.setUp's record builder, verbatim
    * (Random(7), same draw order). */
  private lazy val mainJson: String = {
    val rng = new java.util.Random(7)
    val sb = new StringBuilder(N * 128)
    sb.append('[')
    (0 until N).foreach { i =>
      if (i > 0) sb.append(',')
      val dept = Depts(rng.nextInt(Depts.length))
      val city = Cities(rng.nextInt(Cities.length))
      val age = 18 + rng.nextInt(8)
      val score = (rng.nextInt(7) + 1) / 2.0
      val active = rng.nextBoolean()
      sb.append("{\"id\":").append(i)
        .append(",\"dept\":\"").append(dept)
        .append("\",\"city\":\"").append(city)
        .append("\",\"age\":").append(age)
        .append(",\"score\":").append(score)
        .append(",\"active\":").append(active)
        .append(",\"amount\":").append(rng.nextInt(1000))
      if (i % 10 < 7) sb.append(",\"bonus\":").append(rng.nextInt(1000))
      if (i % 3 != 0)
        sb.append(",\"tier\":\"").append(Tiers(rng.nextInt(Tiers.length)))
          .append('"')
      if (i % 2 == 1)
        sb.append(",\"region\":\"").append(Cities(rng.nextInt(Cities.length)))
          .append("-r\"")
      if (i % 2 == 0) sb.append(",\"flag\":").append(rng.nextBoolean())
      if (i % 5 == 0) sb.append(",\"nully\":null")
      else if (i % 5 < 3) sb.append(",\"nully\":\"n").append(i % 4).append('"')
      if (i % 2 == 0) sb.append(",\"mixed\":").append(i % 7)
      else sb.append(",\"mixed\":\"m").append(i % 7).append('"')
      if (i % 2 == 0) sb.append(",\"rating\":").append(1 + rng.nextInt(5))
      else sb.append(",\"rating\":").append(1 + rng.nextInt(5)).append('.')
        .append(1 + rng.nextInt(9))
      sb.append('}')
    }
    sb.append(']')
    sb.toString
  }

  /** The second (shredder-provenance) resource: Random(11), mixed
    * int/double/decimal renderings of equal values. */
  private lazy val mixJson: String = {
    val rng = new java.util.Random(11)
    val sb = new StringBuilder(N * 64)
    sb.append('[')
    (0 until N).foreach { i =>
      if (i > 0) sb.append(',')
      sb.append("{\"id\":").append(i)
        .append(",\"dept\":\"").append(Depts(rng.nextInt(Depts.length)))
        .append('"')
      if (i % 2 == 0) sb.append(",\"rating\":").append(1 + rng.nextInt(5))
      else sb.append(",\"rating\":").append(1 + rng.nextInt(5))
        .append(if (i % 4 == 1) ".5e0" else ".25e0")
      sb.append(",\"amount\":").append(rng.nextInt(100)).append(".25e0")
      val mixVal = 10 + (i % 4)
      i % 3 match {
        case 0 => sb.append(",\"mix\":").append(mixVal)
        case 1 => sb.append(",\"mix\":").append(mixVal).append(".0e0")
        case _ => sb.append(",\"mix\":").append(mixVal).append(".00")
      }
      val fracBase = 1 + (i % 3)
      i % 3 match {
        case 0 => sb.append(",\"fracmix\":").append(fracBase).append(".5")
        case 1 => sb.append(",\"fracmix\":").append(fracBase).append(".5e0")
        case _ => sb.append(",\"fracmix\":").append(fracBase).append(".50")
      }
      sb.append('}')
    }
    sb.append(']')
    sb.toString
  }

  private lazy val store: JsoniqRun.Store = {
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-gb").toString)
    st.store("typed-gb-db", "records.jn", mainJson)
    st.store("typed-gb-db", "shredded.jn", mixJson)
    st
  }
  private val Src = "jn:doc('typed-gb-db','records.jn')[]"
  private val Src2 = "jn:doc('typed-gb-db','shredded.jn')[]"

  private lazy val mainRecs: Seq[JsonNode] =
    mapper.readTree(mainJson).elements().asScala.toSeq
  private lazy val mixRecs: Seq[JsonNode] =
    mapper.readTree(mixJson).elements().asScala.toSeq

  // ---- oracle: value-equality key model (independent of the engine's
  // canonical-string formulation — doubles/decimals normalize through
  // BigDecimal.stripTrailingZeros here, through one decimal(38,12)
  // rendering there) ----
  private sealed trait KV
  private case object Missing extends KV
  private case object KNull extends KV
  private final case class KBool(b: Boolean) extends KV
  private final case class KStr(s: String) extends KV
  private final case class KNum(plain: String) extends KV

  private def kv(rec: JsonNode, field: String): KV =
    if (!rec.has(field)) Missing
    else {
      val n = rec.get(field)
      if (n.isNull) KNull
      else if (n.isBoolean) KBool(n.asBoolean)
      else if (n.isTextual) KStr(n.asText)
      else KNum(n.decimalValue().stripTrailingZeros().toPlainString)
    }

  private def render(k: KV): String = k match {
    case Missing | KNull => "null"
    case KBool(b) => b.toString
    case KStr(s) => "s:" + s
    case KNum(p) => p
  }

  /** Canonical form of one engine output item (a flat object): field ->
    * type-tagged value with numbers normalized. */
  private def canonItem(json: String): Map[String, String] = {
    val n = mapper.readTree(json)
    require(n.isObject, s"expected object item, got $json")
    n.fields().asScala.map { e =>
      val v = e.getValue
      val s =
        if (v.isNull) "null"
        else if (v.isBoolean) v.asBoolean.toString
        else if (v.isTextual) "s:" + v.asText
        else v.decimalValue().stripTrailingZeros().toPlainString
      e.getKey -> s
    }.toMap
  }

  private def splitItems(out: String): Seq[String] = {
    if (out.isEmpty) return Nil
    val parser = mapper.createParser(out)
    val items = Seq.newBuilder[String]
    while (parser.nextToken() != null)
      items += mapper.writeValueAsString(
        mapper.readTree[JsonNode](parser))
    items.result()
  }

  /** Run `query` and compare against the oracle grouping of `recs` by
    * `fields` under `pred`, rendered as objects with `outNames` for the
    * keys and `countName` for count($u). Row order is normalized (the
    * reference's own differential discipline). */
  private def checkGroupBy(query: String, recs: Seq[JsonNode],
                           fields: Seq[String], outNames: Seq[String],
                           countName: String,
                           pred: JsonNode => Boolean = _ => true): Unit = {
    val expected = recs.filter(pred)
      .groupBy(r => fields.map(kv(r, _)))
      .map { case (keys, rs) =>
        (outNames.zip(keys.map(render)) :+ (countName -> rs.size.toString))
          .toMap
      }.toSeq
    val got = splitItems(JsoniqRun.serialize(store, query)).map(canonItem)
    // canonical row text (sorted fields), multiset compare — Map
    // iteration order is not meaningful
    def rows(ms: Seq[Map[String, String]]): Seq[String] =
      ms.map(_.toSeq.sortBy(_._1).mkString(",")).sorted
    assert(rows(got) == rows(expected),
      s"\nquery: $query\ngot ${got.size} groups: ${rows(got).take(8)}\n" +
        s"want ${expected.size}: ${rows(expected).take(8)}")
  }

  private def checkNumber(query: String, expected: BigDecimal): Unit = {
    val got = BigDecimal(JsoniqRun.serialize(store, query))
    assert((got - expected).abs <= expected.abs * 1e-9 + BigDecimal(1e-9),
      s"\nquery: $query\ngot: $got\nwant: $expected")
  }

  // numeric predicates mirror the engine's: comparisons over missing
  // fields are no-match
  private def num(r: JsonNode, f: String): Option[BigDecimal] =
    if (r.has(f) && r.get(f).isNumber) Some(BigDecimal(r.get(f).decimalValue))
    else None
  private def activeTrue(r: JsonNode): Boolean =
    r.has("active") && r.get("active").asBoolean

  // ==================== single-key, typed values ====================

  test("gb: stringKeyCanonical") {
    checkGroupBy(s"for $$u in $Src let $$d := $$u.dept group by $$d " +
      """return {"dept": $d, "count": count($u)}""",
      mainRecs, Seq("dept"), Seq("dept"), "count")
  }

  test("gb: intKeyCanonical") {
    checkGroupBy(s"for $$u in $Src let $$a := $$u.age group by $$a " +
      """return {"age": $a, "count": count($u)}""",
      mainRecs, Seq("age"), Seq("age"), "count")
  }

  test("gb: booleanKeyCanonical") {
    checkGroupBy(s"for $$u in $Src let $$b := $$u.active group by $$b " +
      """return {"active": $b, "count": count($u)}""",
      mainRecs, Seq("active"), Seq("active"), "count")
  }

  test("gb: doubleKeyCanonical") {
    checkGroupBy(s"for $$u in $Src let $$s := $$u.score group by $$s " +
      """return {"score": $s, "count": count($u)}""",
      mainRecs, Seq("score"), Seq("score"), "count")
  }

  test("gb: renamedStringKey") {
    checkGroupBy(s"for $$u in $Src let $$d := $$u.dept group by $$d " +
      """return {"d": $d, "n": count($u)}""",
      mainRecs, Seq("dept"), Seq("d"), "n")
  }

  // ==================== multi-key ====================

  test("gb: twoStringKeys") {
    checkGroupBy(
      s"for $$u in $Src let $$d := $$u.dept, $$c := $$u.city " +
        """group by $d, $c return {"d": $d, "c": $c, "n": count($u)}""",
      mainRecs, Seq("dept", "city"), Seq("d", "c"), "n")
  }

  test("gb: stringAndIntKeys") {
    checkGroupBy(
      s"for $$u in $Src let $$d := $$u.dept, $$a := $$u.age " +
        """group by $d, $a return {"dept": $d, "age": $a, "count": count($u)}""",
      mainRecs, Seq("dept", "age"), Seq("dept", "age"), "count")
  }

  test("gb: threeKeysMixedTypes") {
    checkGroupBy(
      s"for $$u in $Src let $$d := $$u.dept, $$b := $$u.active, $$a := $$u.age " +
        """group by $d, $b, $a return {"d": $d, "b": $b, "a": $a, "n": count($u)}""",
      mainRecs, Seq("dept", "active", "age"), Seq("d", "b", "a"), "n")
  }

  test("gb: returnOrderDiffersFromSpecOrder") {
    checkGroupBy(
      s"for $$u in $Src let $$d := $$u.dept, $$c := $$u.city " +
        """group by $d, $c return {"city": $c, "dept": $d, "count": count($u)}""",
      mainRecs, Seq("city", "dept"), Seq("city", "dept"), "count")
  }

  // ==================== predicated ====================

  test("gb: predicatedTwoKeys") {
    checkGroupBy(
      s"for $$u in $Src where $$u.active let $$d := $$u.dept, $$c := $$u.city " +
        """group by $d, $c return {"d": $d, "c": $c, "n": count($u)}""",
      mainRecs, Seq("dept", "city"), Seq("d", "c"), "n", activeTrue)
  }

  test("gb: predicatedIntKey") {
    checkGroupBy(
      s"for $$u in $Src where $$u.age gt 20 let $$a := $$u.age group by $$a " +
        """return {"age": $a, "count": count($u)}""",
      mainRecs, Seq("age"), Seq("age"), "count",
      r => num(r, "age").exists(_ > 20))
  }

  test("gb: zoneMapEndsOfTheGroupKeyFilter") {
    Seq[(String, BigDecimal => Boolean)](
      ("gt 1000", _ > 1000), ("ge 0", _ >= 0), ("gt 21", _ > 21)
    ).foreach { case (bound, p) =>
      checkGroupBy(
        s"for $$u in $Src where $$u.age $bound let $$a := $$u.age " +
          """group by $a return {"age": $a, "count": count($u)}""",
        mainRecs, Seq("age"), Seq("age"), "count",
        r => num(r, "age").exists(p))
    }
  }

  test("gb: numCmpPredicateMultiKey") {
    checkGroupBy(
      s"for $$u in $Src where $$u.age gt 19 and $$u.active " +
        s"let $$d := $$u.dept, $$a := $$u.age group by $$d, $$a " +
        """return {"d": $d, "a": $a, "n": count($u)}""",
      mainRecs, Seq("dept", "age"), Seq("d", "a"), "n",
      r => num(r, "age").exists(_ > 19) && activeTrue(r))
  }

  // ============ negative-hash / aggregate regressions ============

  test("gb: countDistinctOverNegativeHashField") {
    checkNumber(
      s"count(for $$u in $Src let $$b := $$u.active group by $$b return $$b)",
      BigDecimal(mainRecs.map(kv(_, "active")).distinct.count(_ != Missing)))
  }

  test("gb: groupByNegativeHashIntField") {
    checkGroupBy(s"for $$u in $Src let $$a := $$u.amount group by $$a " +
      """return {"amount": $a, "count": count($u)}""",
      mainRecs, Seq("amount"), Seq("amount"), "count")
  }

  test("gb: sumAvgOverTypedFields") {
    checkNumber(s"sum(for $$u in $Src return $$u.amount)",
      mainRecs.flatMap(num(_, "amount")).sum)
    checkNumber(s"sum(for $$u in $Src return $$u.score)",
      mainRecs.flatMap(num(_, "score")).sum)
    checkNumber(s"sum(for $$u in $Src where $$u.active return $$u.score)",
      mainRecs.filter(activeTrue).flatMap(num(_, "score")).sum)
    val ages = mainRecs.flatMap(num(_, "age"))
    checkNumber(s"avg(for $$u in $Src return $$u.age)",
      ages.sum / ages.size)
    val over20 = ages.filter(_ > 20)
    checkNumber(s"avg(for $$u in $Src where $$u.age gt 20 return $$u.age)",
      over20.sum / over20.size)
  }

  // ==================== sparse / null / mixed keys ====================

  test("gb: sparseGroupKeyScanPath") {
    checkGroupBy(s"for $$u in $Src let $$t := $$u.tier group by $$t " +
      """return {"tier": $t, "count": count($u)}""",
      mainRecs, Seq("tier"), Seq("tier"), "count")
  }

  test("gb: sparseNumericGroupKeyScanPath") {
    checkGroupBy(s"for $$u in $Src let $$b := $$u.bonus group by $$b " +
      """return {"bonus": $b, "count": count($u)}""",
      mainRecs, Seq("bonus"), Seq("bonus"), "count")
  }

  test("gb: groupKeyMissingOnAllRecords") {
    checkGroupBy(s"for $$u in $Src let $$g := $$u.ghost group by $$g " +
      """return {"g": $g, "count": count($u)}""",
      mainRecs, Seq("ghost"), Seq("g"), "count")
  }

  test("gb: presentButNullGroupKey") {
    // null and MISSING are distinct buckets: both render null in the
    // output object but their counts differ (i%5==0 vs i%5>=3)
    checkGroupBy(s"for $$u in $Src let $$x := $$u.nully group by $$x " +
      """return {"x": $x, "count": count($u)}""",
      mainRecs, Seq("nully"), Seq("x"), "count")
  }

  test("gb: mixedKindGroupKeyGroupsPerType") {
    checkGroupBy(s"for $$u in $Src let $$m := $$u.mixed group by $$m " +
      """return {"m": $m, "count": count($u)}""",
      mainRecs, Seq("mixed"), Seq("m"), "count")
  }

  test("gb: countDistinctOverSparseField") {
    // the missing bucket's `return $t` emits ZERO items
    checkNumber(
      s"count(for $$u in $Src let $$t := $$u.tier group by $$t return $$t)",
      BigDecimal(mainRecs.map(kv(_, "tier")).distinct.count(_ != Missing)))
  }

  // ==================== multi-key sparse combinations ====================

  test("gb: multiKeyWithSparseSecondKey") {
    checkGroupBy(
      s"for $$u in $Src let $$d := $$u.dept, $$t := $$u.tier " +
        """group by $d, $t return {"d": $d, "t": $t, "n": count($u)}""",
      mainRecs, Seq("dept", "tier"), Seq("d", "t"), "n")
  }

  test("gb: multiKeySparseFirstKeyDenseSecond") {
    checkGroupBy(
      s"for $$u in $Src let $$t := $$u.tier, $$d := $$u.dept " +
        """group by $t, $d return {"t": $t, "d": $d, "n": count($u)}""",
      mainRecs, Seq("tier", "dept"), Seq("t", "d"), "n")
  }

  test("gb: multiKeySparseFirstDenseSecondNumericKeys") {
    checkGroupBy(
      s"for $$u in $Src let $$t := $$u.tier, $$a := $$u.age " +
        """group by $t, $a return {"t": $t, "a": $a, "n": count($u)}""",
      mainRecs, Seq("tier", "age"), Seq("t", "a"), "n")
  }

  test("gb: multiKeyDenseAnchorIsThirdKey") {
    checkGroupBy(
      s"for $$u in $Src let $$t := $$u.tier, $$f := $$u.flag, $$c := $$u.city " +
        """group by $t, $f, $c return {"t": $t, "f": $f, "c": $c, "n": count($u)}""",
      mainRecs, Seq("tier", "flag", "city"), Seq("t", "f", "c"), "n")
  }

  test("gb: multiKeyAbsentSecondKeyDenseFirst") {
    checkGroupBy(
      s"for $$u in $Src let $$d := $$u.dept, $$g := $$u.ghost " +
        """group by $d, $g return {"d": $d, "g": $g, "n": count($u)}""",
      mainRecs, Seq("dept", "ghost"), Seq("d", "g"), "n")
  }

  test("gb: multiKeySparseFirstAbsentSecondDenseThird") {
    checkGroupBy(
      s"for $$u in $Src let $$t := $$u.tier, $$g := $$u.ghost, $$c := $$u.city " +
        """group by $t, $g, $c return {"t": $t, "g": $g, "c": $c, "n": count($u)}""",
      mainRecs, Seq("tier", "ghost", "city"), Seq("t", "g", "c"), "n")
  }

  test("gb: multiKeyBothSparse") {
    checkGroupBy(
      s"for $$u in $Src let $$t := $$u.tier, $$r := $$u.region " +
        """group by $t, $r return {"t": $t, "r": $r, "n": count($u)}""",
      mainRecs, Seq("tier", "region"), Seq("t", "r"), "n")
  }

  test("gb: multiKeyBothSparsePlusAbsentKey") {
    checkGroupBy(
      s"for $$u in $Src let $$t := $$u.tier, $$r := $$u.region, $$g := $$u.ghost " +
        """group by $t, $r, $g return {"t": $t, "r": $r, "g": $g, "n": count($u)}""",
      mainRecs, Seq("tier", "region", "ghost"), Seq("t", "r", "g"), "n")
  }

  test("gb: multiKeySparseKeyOrderDoesNotChangeTheGrouping") {
    checkGroupBy(
      s"for $$u in $Src let $$r := $$u.region, $$t := $$u.tier " +
        """group by $r, $t return {"r": $r, "t": $t, "n": count($u)}""",
      mainRecs, Seq("region", "tier"), Seq("r", "t"), "n")
  }

  // ============ mixed-provenance numeric merging (SRC2) ============

  test("gb: doubleRowsRangeAndGroupBy") {
    checkNumber(s"count(for $$u in $Src2 where $$u.rating ge 1.5 " +
      s"and $$u.rating le 3.5 return $$u)",
      BigDecimal(mixRecs.count(r =>
        num(r, "rating").exists(v => v >= 1.5 && v <= 3.5))))
    checkGroupBy(
      s"for $$u in $Src2 where $$u.rating gt 2.5 let $$d := $$u.dept " +
        """group by $d return {"dept": $d, "count": count($u)}""",
      mixRecs, Seq("dept"), Seq("dept"), "count",
      r => num(r, "rating").exists(_ > 2.5))
    checkGroupBy(s"for $$u in $Src2 let $$r := $$u.rating group by $$r " +
      """return {"rating": $r, "count": count($u)}""",
      mixRecs, Seq("rating"), Seq("rating"), "count")
  }

  test("gb: mixedProvenanceIntegralGroupKeysMerge") {
    // 18, 18.0e0 and 18.00 are ONE group — four mix values, not twelve
    checkGroupBy(s"for $$u in $Src2 let $$m := $$u.mix group by $$m " +
      """return {"m": $m, "n": count($u)}""",
      mixRecs, Seq("mix"), Seq("m"), "n")
    assert(mixRecs.map(kv(_, "mix")).distinct.size == 4)
  }

  test("gb: mixedProvenanceFractionalGroupKeysMerge") {
    checkGroupBy(s"for $$u in $Src2 let $$f := $$u.fracmix group by $$f " +
      """return {"f": $f, "n": count($u)}""",
      mixRecs, Seq("fracmix"), Seq("f"), "n")
    assert(mixRecs.map(kv(_, "fracmix")).distinct.size == 3)
  }

  test("gb: mixedProvenanceCountDistinct") {
    checkNumber(
      s"count(for $$u in $Src2 let $$m := $$u.mix group by $$m return $$m)",
      BigDecimal(4))
    checkNumber(
      s"count(for $$u in $Src2 let $$f := $$u.fracmix group by $$f return $$f)",
      BigDecimal(3))
  }

  test("gb: mixedProvenanceMultiKeyGroupBy") {
    checkGroupBy(
      s"for $$u in $Src2 let $$d := $$u.dept, $$m := $$u.mix " +
        """group by $d, $m return {"d": $d, "m": $m, "n": count($u)}""",
      mixRecs, Seq("dept", "mix"), Seq("d", "m"), "n")
  }

  test("gb: sumOverDoubleProvenance") {
    checkNumber(s"sum(for $$u in $Src2 return $$u.amount)",
      mixRecs.flatMap(num(_, "amount")).sum)
    checkNumber(s"sum(for $$u in $Src2 where $$u.rating gt 2.5 " +
      s"return $$u.amount)",
      mixRecs.filter(r => num(r, "rating").exists(_ > 2.5))
        .flatMap(num(_, "amount")).sum)
  }

  // ============ numeric predicate families (SRC scan path) ============

  private def countWhere(field: String, p: BigDecimal => Boolean): BigDecimal =
    BigDecimal(mainRecs.count(r => num(r, field).exists(p)))

  test("gb: doublePredicateOnDoubleColumn") {
    // Historically TRUNCATED in the reference: `score gt 2.5` ran as
    // `score gt 2`
    checkNumber(s"count(for $$u in $Src where $$u.score gt 2.5 return $$u)",
      countWhere("score", _ > 2.5))
    checkNumber(s"count(for $$u in $Src where $$u.score le 0.5 return $$u)",
      countWhere("score", _ <= 0.5))
    checkNumber(s"count(for $$u in $Src where $$u.score eq 2.5 return $$u)",
      countWhere("score", _ == 2.5))
    checkNumber(s"count(for $$u in $Src where $$u.score ge 1.5 " +
      s"and $$u.score lt 3.5 return $$u)",
      countWhere("score", v => v >= 1.5 && v < 3.5))
  }

  test("gb: fractionalThresholdOnIntegerColumn") {
    Seq[(String, BigDecimal => Boolean)](
      ("gt 20.5", _ > 20.5), ("ge 20.5", _ >= 20.5), ("lt 20.5", _ < 20.5),
      ("le 20.5", _ <= 20.5), ("eq 20.999", _ == 20.999), ("eq 21.0", _ == 21)
    ).foreach { case (cond, p) =>
      checkNumber(s"count(for $$u in $Src where $$u.age $cond return $$u)",
        countWhere("age", p))
    }
  }

  test("gb: doubleLiteralFormPredicates") {
    checkNumber(s"count(for $$u in $Src where $$u.score gt 2.5e0 return $$u)",
      countWhere("score", _ > 2.5))
    checkNumber(s"count(for $$u in $Src where $$u.age ge 2.05e1 return $$u)",
      countWhere("age", _ >= 20.5))
  }

  test("gb: mixedIntDoubleColumnPredicates") {
    // the rating 3-vs-3.7 family: an integer literal over a mixed
    // column must promote the double rows, never truncate them
    Seq[(String, BigDecimal => Boolean)](
      ("gt 3", _ > 3), ("le 3", _ <= 3), ("eq 3", _ == 3),
      ("gt 3.5", _ > 3.5), ("eq 3.7", _ == 3.7)
    ).foreach { case (cond, p) =>
      checkNumber(s"count(for $$u in $Src where $$u.rating $cond return $$u)",
        countWhere("rating", p))
    }
  }

  test("gb: mixedColumnGroupByWithDoublePredicate") {
    checkGroupBy(
      s"for $$u in $Src where $$u.rating gt 2.5 let $$d := $$u.dept " +
        """group by $d return {"dept": $d, "count": count($u)}""",
      mainRecs, Seq("dept"), Seq("dept"), "count",
      r => num(r, "rating").exists(_ > 2.5))
  }

  test("gb: doublePredicateWithAggregate") {
    checkNumber(s"sum(for $$u in $Src where $$u.score gt 2.5 return $$u.amount)",
      mainRecs.filter(r => num(r, "score").exists(_ > 2.5))
        .flatMap(num(_, "amount")).sum)
    val le15 = mainRecs.filter(r => num(r, "score").exists(_ <= 1.5))
      .flatMap(num(_, "age"))
    checkNumber(s"avg(for $$u in $Src where $$u.score le 1.5 return $$u.age)",
      le15.sum / le15.size)
  }

  test("gb: sparseFieldWithDoubleThreshold") {
    checkNumber(s"count(for $$u in $Src where $$u.bonus gt 500.5 return $$u)",
      countWhere("bonus", _ > 500.5))
    checkNumber(s"count(for $$u in $Src where $$u.bonus le 499.5 return $$u)",
      countWhere("bonus", _ <= 499.5))
  }

  test("gb: negativeZeroGroupKeyMergesWithZero") {
    // the zero family is ONE group (BigDecimal has no signed zero)
    val st = store
    st.store("typed-gb-db", "negzero.jn",
      """[{"v":0},{"v":-0.0e0},{"v":0.0e0},{"v":1}]""")
    val got = splitItems(JsoniqRun.serialize(st,
      s"for $$u in jn:doc('typed-gb-db','negzero.jn')[] let $$v := $$u.v " +
        """group by $v return {"v": $v, "n": count($u)}"""))
      .map(canonItem).map(_("n")).sorted
    assert(got == Seq("1", "3"), got)
  }

  test("gb: fine-fraction keys stay distinct (no fixed-scale rounding)") {
    // keys differing only at the 13th fractional digit must NOT merge
    val st = store
    st.store("typed-gb-db", "fine.jn",
      """[{"v":1.0e-13},{"v":2.0e-13},{"v":0}]""")
    val got = splitItems(JsoniqRun.serialize(st,
      s"for $$u in jn:doc('typed-gb-db','fine.jn')[] let $$v := $$u.v " +
        """group by $v return {"v": $v, "n": count($u)}"""))
    assert(got.size == 3, got)
  }

  test("gb: a multi-item grouping key fails loudly (XPTY0004)") {
    val e = intercept[Exception](JsoniqRun.serialize(store,
      "for $u in (1, 2) let $k := (1, 2) group by $k return $k"))
    assert(e.getMessage.contains("XPTY0004") ||
      Option(e.getCause).exists(_.getMessage.contains("XPTY0004")),
      e.getMessage)
  }

  test("gb: object/array grouping keys fail loudly (XPTY0004)") {
    // non-atomizable keys must not group by raw JSON text (value-equal
    // objects with different key order would split groups)
    val eo = intercept[Exception](JsoniqRun.serialize(store,
      """for $u in (1, 2) let $k := {"a": $u mod 1} group by $k return $k"""))
    assert(eo.getMessage.contains("XPTY0004") ||
      Option(eo.getCause).exists(_.getMessage.contains("XPTY0004")),
      eo.getMessage)
    val ea = intercept[Exception](JsoniqRun.serialize(store,
      "for $u in (1, 2) let $k := [1] group by $k return $k"))
    assert(ea.getMessage.contains("XPTY0004") ||
      Option(ea.getCause).exists(_.getMessage.contains("XPTY0004")),
      ea.getMessage)
  }

  test("gb: plateau long/double keys group by EXACT value") {
    // above 2^53 the reference's double-image grouping is order-
    // dependent and its vectorized path fails loud; this engine's
    // decimal canonical keys group by exact numeric VALUE, so
    // 9007199254740993 stays its own group and the double
    // 9007199254740992.0e0 merges with the equal long
    val st = store
    st.store("typed-gb-db", "plateau.jn",
      """[{"v":9007199254740993},{"v":9007199254740992.0e0},{"v":9007199254740992}]""")
    val got = splitItems(JsoniqRun.serialize(st,
      s"for $$u in jn:doc('typed-gb-db','plateau.jn')[] let $$v := $$u.v " +
        """group by $v return {"v": $v, "n": count($u)}"""))
      .map(canonItem).map(_("n")).sorted
    assert(got == Seq("1", "2"), got)
  }

  // ==================== count clause ====================

  test("gb: count clause binds 1-based tuple ordinal") {
    val st = store
    assert(JsoniqRun.serialize(st,
      "for $i in (10, 20, 30) count $c return {\"i\": $i, \"c\": $c}") ==
      """{"c":1,"i":10} {"c":2,"i":20} {"c":3,"i":30}""")
    // after a where: counts the SURVIVING tuples
    assert(JsoniqRun.serialize(st,
      "for $i in (10, 20, 30) where $i gt 10 count $c return $c") == "1 2")
    // count var usable in later clauses
    assert(JsoniqRun.serialize(st,
      "for $i in (10, 20, 30) count $c where $c lt 3 return $i") == "10 20")
  }

  test("gb: group-by then order-by over the grouped stream") {
    val got = JsoniqRun.serialize(store,
      s"for $$u in $Src let $$d := $$u.dept group by $$d " +
        "order by $d return $d")
    assert(got == "\"Eng\" \"Mkt\" \"Ops\" \"Sales\"", got)
  }

  test("gb: aggregate over the grouped sequence beyond count") {
    // sum over the regrouped non-key variable's derefs
    val expected = mainRecs.groupBy(r => kv(r, "dept")).map {
      case (k, rs) => (render(k), rs.flatMap(num(_, "amount")).sum)
    }
    val got = splitItems(JsoniqRun.serialize(store,
      s"for $$u in $Src let $$d := $$u.dept group by $$d " +
        """return {"d": $d, "s": sum($u.amount)}""")).map(canonItem)
    val want = expected.map { case (d, s) =>
      Map("d" -> d, "s" -> s.underlying.stripTrailingZeros.toPlainString)
    }.toSeq
    def rows(ms: Seq[Map[String, String]]): Seq[String] =
      ms.map(_.toSeq.sortBy(_._1).mkString(",")).sorted
    assert(rows(got) == rows(want),
      s"\ngot: ${rows(got).take(5)}\nwant: ${rows(want).take(5)}")
  }
}
