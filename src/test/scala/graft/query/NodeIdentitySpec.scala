package graft.query

import graft.SparkSpec

import java.nio.file.Files

/** End-to-end node identity through the textual front end: replays of
  * the reference's own nodekey-surface tests (JsonGetNodeKeyTest,
  * SelectJsonItemTest, GetChildCountTest, GetDescendantCountTest,
  * LevelOrderTest — bundles/sirix-query/src/test/java/io/sirix/query/
  * function/sdb/trx, .../jn/trx) with their pinned outputs VERBATIM,
  * plus the cross-revision key-stability discipline the reference's
  * update transactions guarantee (JsonNodeTrxImpl insert paths,
  * JsonItemSequence.replaceObjectValue's in-place set*Value). */
class NodeIdentitySpec extends SparkSpec {

  private def freshStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-nid").toString)

  private def run(st: JsoniqRun.Store, q: String): String =
    JsoniqRun.serialize(st, q)

  // ---- sdb:nodekey (JsonGetNodeKeyTest.java:45) ----

  test("nodekey of the second array member is 3 (JsonGetNodeKeyTest)") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["bla", "blubb"]')""")
    assert(run(st,
      "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[1])") === "3")
  }

  test("nodekey per FLWOR binding: members number 2 and 3") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["bla", "blubb"]')""")
    assert(run(st,
      "for $i in jn:doc('json-path1','mydoc.jn')[] return sdb:nodekey($i)")
      === "2 3")
  }

  test("nodekey through deref chains: fused fields number preorder") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','[{"name":"Alice"}, {"name":"Bob"}]')""")
    assert(run(st,
      """for $i in jn:doc('json-path1','mydoc.jn')[]
        |return {"o": sdb:nodekey($i), "n": sdb:nodekey($i.name)}"""
        .stripMargin) === """{"n":3,"o":2} {"n":5,"o":4}""")
  }

  // ---- jn:select-json-item / sdb:select-item (SelectJsonItemTest) ----

  test("select root array by key 1 (SelectJsonItemTest.testSelectRootArray)") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["bla", "blubb"]')""")
    assert(run(st,
      "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 1)")
      === """["bla","blubb"]""")
  }

  test("select first string by key 2 (testSelectStringItem)") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["bla", "blubb"]')""")
    assert(run(st,
      "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 2)")
      === "\"bla\"")
  }

  test("select first object by key 2 (testSelectNestedObject)") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','[{"name":"Alice"}, {"name":"Bob"}]')""")
    assert(run(st,
      "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 2)")
      === """{"name":"Alice"}""")
  }

  test("invalid node key throws (testSelectInvalidNodeKeyThrows)") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["bla"]')""")
    val e = intercept[IllegalArgumentException](run(st,
      "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 999)"))
    assert(e.getMessage.contains("999"))
  }

  test("sdb:select-item is the sdb alias; a fused field key serves its value") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','[{"name":"Alice"}, {"name":"Bob"}]')""")
    // key 3 = fused "name" record of the first object: the item
    // factory's VALUE view (JsonItemFactory.java:62)
    assert(run(st,
      "sdb:select-item(jn:doc('json-path1','mydoc.jn'), 3)")
      === "\"Alice\"")
  }

  // ---- sdb:child-count (GetChildCountTest) ----

  test("child-count of a 3-member array is 3") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["a", "b", "c"]')""")
    assert(run(st,
      "sdb:child-count(jn:doc('json-path1','mydoc.jn'))") === "3")
  }

  test("child-count of a 2-field object is 2") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','{"a":1, "b":2}')""")
    assert(run(st,
      "sdb:child-count(jn:doc('json-path1','mydoc.jn'))") === "2")
  }

  test("child-count of a string leaf is 0") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["bla", "blubb"]')""")
    assert(run(st,
      "sdb:child-count(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 2))")
      === "0")
  }

  // ---- sdb:descendant-count (GetDescendantCountTest) ----

  test("descendant-count of a 3-member array is 3") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["a", "b", "c"]')""")
    assert(run(st,
      "sdb:descendant-count(jn:doc('json-path1','mydoc.jn'))") === "3")
  }

  test("descendant-count under fusion: {a:{b:1}} has exactly 2") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','{"a": {"b": 1}}')""")
    assert(run(st,
      "sdb:descendant-count(jn:doc('json-path1','mydoc.jn'))") === "2")
  }

  test("descendant-count of a string leaf is 0") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["bla", "blubb"]')""")
    assert(run(st,
      "sdb:descendant-count(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 2))")
      === "0")
  }

  // ---- sdb:level-order (LevelOrderTest) ----

  test("level-order over a flat array visits every member in order") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["a", "b", "c"]')""")
    assert(run(st,
      "for $node in sdb:level-order(jn:doc('json-path1','mydoc.jn')) return $node")
      === "\"a\" \"b\" \"c\"")
  }

  test("level-order depth limit: direct children only, then the full BFS") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','[{"a": {"deep": 1}}, {"b": 2}]')""")
    assert(run(st,
      "count(sdb:level-order(jn:doc('json-path1','mydoc.jn'), 1))") === "2")
    // members (2) + fused a / fused b (level 2) + fused deep (level 3)
    assert(run(st,
      "count(sdb:level-order(jn:doc('json-path1','mydoc.jn')))") === "5")
    // BFS order: the two member objects first, then their fused
    // fields' values level by level
    assert(run(st,
      "for $n in sdb:level-order(jn:doc('json-path1','mydoc.jn')) return $n")
      === """{"a":{"deep":1}} {"b":2} {"deep":1} 2 1""")
  }

  // ---- cross-revision key stability (the update edit-log replay) ----

  test("same-kind primitive replace keeps every key (set*Value fast path)") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','[{"name":"Laptop","price":999}]')""")
    val before = run(st,
      "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[0].price)")
    run(st,
      """replace json value of jn:doc('json-path1','mydoc.jn')[0].price with 899""")
    assert(run(st, "jn:doc('json-path1','mydoc.jn')")
      === """[{"name":"Laptop","price":899}]""")
    assert(run(st,
      "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[0].price)") === before)
  }

  test("kind-changing replace re-mints; delete keeps survivors; append mints fresh") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','[{"a":1},{"b":2},{"c":3}]')""")
    // arr=1, {a}=2, a=3, {b}=4, b=5, {c}=6, c=7
    assert(run(st, "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[2])") === "6")
    run(st, "delete json jn:doc('json-path1','mydoc.jn')[1]")
    // {"c":3} shifted to index 1 but KEEPS key 6
    assert(run(st, "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[1])") === "6")
    run(st, """append json {"d":4} into jn:doc('json-path1','mydoc.jn')""")
    // fresh keys from maxKey+1 = 8, never the deleted 4
    assert(run(st, "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[2])") === "8")
    assert(run(st, "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[2].d)") === "9")
  }

  test("sdb:commit keeps node keys (content-identical empty commit)") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','[{"a":1},{"b":2},{"c":3}]')""")
    run(st, "delete json jn:doc('json-path1','mydoc.jn')[1]")
    // survivor {"c":3} keeps key 6 across the update...
    assert(run(st, "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[1])") === "6")
    // ...and across a byte-copy commit (an empty commit keeps the
    // page trees in the reference — keys must not re-mint)
    run(st, "sdb:commit(jn:doc('json-path1','mydoc.jn'))")
    assert(run(st, "sdb:nodekey(jn:doc('json-path1','mydoc.jn')[1])") === "6")
  }

  test("select-item resolves against the queried revision's own tree") {
    val st = freshStore()
    run(st, """jn:store('json-path1','mydoc.jn','["original"]')""")
    run(st, """append json "appended" into jn:doc('json-path1','mydoc.jn')""")
    // rev 1: key 2 = "original" and key 3 is absent; rev 2: key 3 fresh
    assert(run(st,
      "jn:select-json-item(jn:doc('json-path1','mydoc.jn', 1), 2)")
      === "\"original\"")
    assert(run(st,
      "jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 3)")
      === "\"appended\"")
    intercept[IllegalArgumentException](run(st,
      "jn:select-json-item(jn:doc('json-path1','mydoc.jn', 1), 3)"))
  }
}
