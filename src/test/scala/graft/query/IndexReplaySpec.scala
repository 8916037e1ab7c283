package graft.query

import graft.SparkSpec

import java.nio.file.Files

/** Verbatim replays of the reference's index integration families
  * (bundles/sirix-query/src/test/java/io/sirix/query/function/jn/index/
  * IndexVersioningIntegrationTest.java and
  * PredicateOverUnwrappedArrayTest.java): store + index DDL + updates +
  * query text run unchanged, compared against the reference's pinned
  * assertions. `sdb:nodekey` values compare VERBATIM against the
  * reference's FUSED-mode pins (IndexVersioningIntegrationTest.java:45
  * selects them under sirix.json.fuseNamedPrimitives — the record
  * model this engine's [[NodeKeys]] implements). */
class IndexReplaySpec extends SparkSpec {

  private def check(setup: Seq[String], query: String,
                    pinned: String): Unit = {
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-idx-replay").toString)
    setup.foreach(JsoniqRun.serialize(st, _))
    val got = JsoniqRun.serialize(st, query)
    assert(got == pinned, s"\nquery: $query\ngot:   $got\nwant:  $pinned")
  }

  // ---- IndexVersioningIntegrationTest: Path Index Tests ----

  test("idx: path index optimizes access to array elements") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0},{"value":[{"key":{"boolean":true}},{"newkey":"yes"}]},{"key":"hey","value":false}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('//*', '//[]')) return {"revision": sdb:commit($doc)}"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[].value[].key[?$$.boolean] return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"boolean":true,"nodekey":7}""")
  }

  test("idx: path index works after data modification") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"products": [{"name": "Widget", "price": 10}]}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('/products', '/products/[]', '/products/[]/name')) return sdb:commit($doc)""",
      """append json {"name": "Gadget", "price": 20} into jn:doc('json-path1','mydoc.jn').products"""),
      """for $p in jn:doc('json-path1','mydoc.jn').products[] order by $p.price return $p.name""",
      "\"Widget\" \"Gadget\"")
  }

  test("idx: path index correctly filters with predicates") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"id":1,"active":true},{"id":2,"active":false},{"id":3,"active":true}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('//[]', '//*')) return {"revision": sdb:commit($doc)}"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[] where $i.active eq true() order by $i.id return $i.id""",
      "1 3")
  }

  // ---- CAS Index Tests ----

  test("idx: CAS index optimizes integer comparisons") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0},{"value":[{"key":{"boolean":5}},{"newkey":"yes"}]},{"key":"hey","value":false}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-cas-index($doc, 'xs:integer', '/[]/value/[]/key/boolean') return {"revision": sdb:commit($doc)}"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[1].value[].key[?$$.boolean gt 3] return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"boolean":5,"nodekey":7}""")
  }

  test("idx: CAS index works with string values after updates") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"status":"pending"},{"status":"pending"},{"status":"done"}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-cas-index($doc, 'xs:string', '/[]/status') return sdb:commit($doc)""",
      """replace json value of jn:doc('json-path1','mydoc.jn')[0].status with "done""""),
      """count(for $i in jn:doc('json-path1','mydoc.jn')[] where $i.status eq 'done' return $i)""",
      "2")
  }

  test("idx: CAS index works with multiple numeric operations") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"price":10},{"price":50},{"price":100},{"price":200}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-cas-index($doc, 'xs:integer', '/[]/price') return {"revision": sdb:commit($doc)}"""),
      """count(for $i in jn:doc('json-path1','mydoc.jn')[] where $i.price ge 50 return $i)""",
      "3")
  }

  // ---- Name Index Tests ----

  test("idx: name index optimizes field name lookups") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"data": {"title": "First"}, "metadata": {"title": "Second"}}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-name-index($doc, ('title', 'data', 'metadata')) return {"revision": sdb:commit($doc)}"""),
      """let $d := jn:doc('json-path1','mydoc.jn') return ($d.data.title, $d.metadata.title)""",
      "\"First\" \"Second\"")
  }

  test("idx: name index works after adding new fields") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"items": [{"tag": "one"}]}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-name-index($doc, ('items', 'tag')) return sdb:commit($doc)""",
      """append json {"tag": "two"} into jn:doc('json-path1','mydoc.jn').items"""),
      """for $t in jn:doc('json-path1','mydoc.jn').items[].tag order by $t return $t""",
      "\"one\" \"two\"")
  }

  // ---- Combined Index Scenarios ----

  test("idx: multiple indexes work together") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"users": [{"name": "Alice", "age": 30}, {"name": "Bob", "age": 25}]}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $pathIdx := jn:create-path-index($doc, ('/users', '/users/[]')) let $casIdx := jn:create-cas-index($doc, 'xs:integer', '/users/[]/age') let $nameIdx := jn:create-name-index($doc, ('users', 'name', 'age')) return sdb:commit($doc)"""),
      """for $u in jn:doc('json-path1','mydoc.jn').users[] where $u.age gt 26 return $u.name""",
      "\"Alice\"")
  }

  test("idx: index correctly handles delete and insert across revisions") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"v":1},{"v":2},{"v":3}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('//[]', '//*')) return sdb:commit($doc)""",
      """delete json jn:doc('json-path1','mydoc.jn')[0]""",
      """append json {"v": 4} into jn:doc('json-path1','mydoc.jn')"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[] order by $i.v return $i.v""",
      "2 3 4")
  }

  test("idx: index correctly handles replace value") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"item": {"name": "old", "count": 5}}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-cas-index($doc, 'xs:string', '/item/name') return sdb:commit($doc)""",
      """replace json value of jn:doc('json-path1','mydoc.jn').item.name with "new""""),
      """jn:doc('json-path1','mydoc.jn').item.name""",
      "\"new\"")
  }

  test("idx: index works with deeply nested structures") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"l1": {"l2": {"l3": [{"val": 1}, {"val": 2}]}}}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('/l1', '/l1/l2', '/l1/l2/l3', '/l1/l2/l3/[]')) return sdb:commit($doc)"""),
      """for $v in jn:doc('json-path1','mydoc.jn').l1.l2.l3[].val order by $v return $v""",
      "1 2")
  }

  // ---- Multi-Revision Index Tests ----

  test("idx: index maintains correctness across multiple separate commits") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"id":1}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('//[]', '//*')) return sdb:commit($doc)""",
      """append json {"id":2} into jn:doc('json-path1','mydoc.jn')""",
      """append json {"id":3} into jn:doc('json-path1','mydoc.jn')"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[] order by $i.id return $i.id""",
      "1 2 3")
  }

  test("idx: CAS index correctly tracks value changes across revisions") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"id":1,"status":"new"},{"id":2,"status":"new"}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-cas-index($doc, 'xs:string', '/[]/status') return sdb:commit($doc)""",
      """replace json value of jn:doc('json-path1','mydoc.jn')[0].status with "processed"""",
      """replace json value of jn:doc('json-path1','mydoc.jn')[1].status with "processed""""),
      """count(for $i in jn:doc('json-path1','mydoc.jn')[] where $i.status eq 'processed' return $i)""",
      "2")
  }

  test("idx: name index handles field additions across multiple revisions") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"root": {"items": []}}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-name-index($doc, ('root', 'items', 'tag')) return sdb:commit($doc)""",
      """append json {"tag": "a"} into jn:doc('json-path1','mydoc.jn').root.items""",
      """append json {"tag": "b"} into jn:doc('json-path1','mydoc.jn').root.items""",
      """append json {"tag": "c"} into jn:doc('json-path1','mydoc.jn').root.items"""),
      """for $t in jn:doc('json-path1','mydoc.jn').root.items[].tag order by $t return $t""",
      "\"a\" \"b\" \"c\"")
  }

  // ---- PredicateOverUnwrappedArrayTest: $$-predicate over an
  // unwrapped multi-segment array in three index configurations ----

  private val BookStore =
    """jn:store('json-path1','mydoc.jn','{"store":{"book":[{"title":"A","price":12.5},{"title":"B","price":8.25},{"title":"C","price":42}]}}')"""
  private val PredicateQuery =
    """jn:doc('json-path1','mydoc.jn').store.book[][?$$.price gt 10]"""
  private val BookExpected =
    """{"price":12.5,"title":"A"} {"price":42,"title":"C"}"""

  test("idx: $$-predicate over unwrapped array — NO index") {
    check(Seq(BookStore), PredicateQuery, BookExpected)
  }

  test("idx: $$-predicate over unwrapped array — CAS index on the field") {
    check(Seq(BookStore,
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-cas-index($doc, 'xs:decimal', '/store/book/[]/price') return {"revision": sdb:commit($doc)}"""),
      PredicateQuery, BookExpected)
  }

  test("idx: $$-predicate over unwrapped array — path index on the array") {
    check(Seq(BookStore,
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('/store/book', '/store/book/[]', '/store/book/[]/price')) return {"revision": sdb:commit($doc)}"""),
      PredicateQuery, BookExpected)
  }

  test("idx: $$-predicate string equality over unwrapped array") {
    check(Seq(BookStore),
      """jn:doc('json-path1','mydoc.jn').store.book[][?$$.title eq "A"]""",
      """{"price":12.5,"title":"A"}""")
  }

  test("idx: $$-predicate ge keeps the boundary row") {
    check(Seq(BookStore),
      """jn:doc('json-path1','mydoc.jn').store.book[][?$$.price ge 12.5]""",
      BookExpected)
  }

  // ---- ValidTimeIndexDropTest's textual surface (jn/temporal/
  // ValidTimeIndexDropTest.java): drop persists, the valid-at fallback
  // stays correct, sibling CAS indexes survive the drop ----

  test("idx: drop-valid-time-index persists; valid-at fallback correct; CAS survives") {
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-vt-drop").toString)
    def ser(q: String) = JsoniqRun.serialize(st, q)
    ser("""jn:store('vtd','r.jn','[{"id": 1, "validFrom": "2024-01-01T00:00:00Z", "validTo": "2024-06-30T00:00:00Z"},{"id": 2, "validFrom": "2024-05-01T00:00:00Z", "validTo": "2024-12-31T00:00:00Z"}]', true(), {"validFromPath": "validFrom", "validToPath": "validTo"})""")
    assert(ser("jn:create-valid-time-index(jn:doc('vtd','r.jn'))") == "0")
    ser("""let $d := jn:doc('vtd','r.jn')
          |let $s := jn:create-cas-index($d, 'xs:decimal', '/[]/id')
          |return {"revision": sdb:commit($d)}""".stripMargin)
    val stab = "for $r in jn:valid-at('vtd','r.jn', " +
      "xs:dateTime('2024-06-01T00:00:00Z')) return $r.id"
    assert(ser(stab) == "1 2")
    // drop VALIDTIME: the CAS definition survives, valid-at answers
    // identically through the fallback path
    ser("jn:drop-valid-time-index(jn:doc('vtd','r.jn'))")
    assert(st.indexDefs("vtd", "r.jn").map(_.kind) == Seq("cas"))
    assert(ser(stab) == "1 2")
    assert(ser("""jn:find-cas-index(jn:doc('vtd','r.jn'), 'xs:decimal', '/[]/id')""") == "1")
    // a re-create registers a FRESH handle (numbers are never reused)
    assert(ser("jn:create-valid-time-index(jn:doc('vtd','r.jn'))") == "2")
  }

  test("idx: $$-predicate after append (second revision)") {
    check(Seq(BookStore,
      """append json {"title":"D","price":99} into jn:doc('json-path1','mydoc.jn').store.book"""),
      PredicateQuery,
      """{"price":12.5,"title":"A"} {"price":42,"title":"C"} {"price":99,"title":"D"}""")
  }
}
