package graft.query

import graft.SparkSpec

/** `sdb:explain` (reference function/sdb/explain/Explain.java):
  * compiles the argument query through the full planning pipeline and
  * returns the plan WITHOUT executing it. The structural value: the
  * formatted physical plan names PushedFilters/ReadSchema, so a
  * pushdown regression (a typed shred filter silently degrading to a
  * per-row variant walk) fails a STRING assertion, not just a timing. */
class ExplainRouteSpec extends SparkSpec {

  private def mkStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("graft-explain").toString)

  test("explain of a typed shred filter names the pushed filter") {
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val st = mkStore()
      val doc = (1 to 40).map(i => s"""{"v": $i, "w": ${i % 10}}""")
        .mkString("[", ",", "]")
      st.store("c", "d.jn", doc)
      assert(st.isShredded("c", "d.jn"))
      val plan = JsoniqRun.serialize(st,
        "sdb:explain('count(jn:doc(\"c\",\"d.jn\")[][?$$.w gt 5])')")
      assert(plan.contains("Scan parquet"), plan.take(500))
      // the typed-column arm: the scan reads ONLY the typed struct
      // column (pruned), with the null guard pushed to parquet — a
      // regression to the variant walk would read `member` instead
      assert(plan.contains("PushedFilters: [IsNotNull(t.w)]"),
        plan.take(2000))
      assert(plan.contains("ReadSchema: struct<t:struct<w:bigint>>"),
        plan.take(2000))
      assert(!plan.contains("variant_get"), plan.take(2000))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("explain does not execute and verbose adds the logical plans") {
    val st = mkStore()
    st.store("c", "e.jn", """{"a": 1}""")
    val plan = JsoniqRun.serialize(st,
      "sdb:explain('jn:doc(\"c\",\"e.jn\").a', true())")
    assert(plan.contains("== Optimized Logical Plan =="))
    assert(plan.contains("== Physical Plan =="))
  }

  test("explain refuses side-effecting queries instead of running them") {
    // r15: side-effectful routes run eagerly during compile — explaining
    // a jn:store or an update statement would perform the write
    val st = mkStore()
    st.store("c", "f.jn", """{"a": 1}""")
    val rev0 = graft.sources.TemporalTable
      .mostRecentRevision(st.docPath("c", "f.jn")).get
    intercept[UnsupportedOperationException](JsoniqRun.serialize(st,
      """sdb:explain('jn:store("c","f.jn","[1]")')"""))
    intercept[UnsupportedOperationException](JsoniqRun.serialize(st,
      """sdb:explain('replace json value of jn:doc("c","f.jn").a with 2')"""))
    // and NOTHING was written
    assert(graft.sources.TemporalTable
      .mostRecentRevision(st.docPath("c", "f.jn")).get === rev0)
    assert(JsoniqRun.serialize(st, "jn:doc('c','f.jn').a") === "1")
  }
}
