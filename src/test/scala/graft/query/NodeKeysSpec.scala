package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** Fused preorder key assignment, pinned against the reference's OWN
  * expected node keys (SelectJsonItemTest, JsonIntegrationTest
  * .testArrayIteration, IndexVersioningIntegrationTest with
  * FUSE_NAMED_PRIMITIVES, GetChildCountTest / GetDescendantCountTest),
  * plus the update-stability replay discipline
  * (JsonItemSequence.replaceObjectValue / JsonNodeTrxImpl insert
  * paths). */
class NodeKeysSpec extends AnyFunSuite {

  private def keyAt(t: NodeKeys.KTree, p: Either[String, Int]*): Long =
    t.lookup(p.toList).map(_.key).getOrElse(
      fail(s"no node at ${NodeKeys.renderPath(p.toList)}"))

  test("root array of strings: 1, 2, 3 (SelectJsonItemTest)") {
    val t = NodeKeys.build("""["bla", "blubb"]""")
    assert(t.root.key === 1L)
    assert(keyAt(t, Right(0)) === 2L)
    assert(keyAt(t, Right(1)) === 3L)
    assert(t.maxKey === 3L)
  }

  test("array of objects: member objects 2 and 4 (testSelectNestedObject)") {
    val t = NodeKeys.build("""[{"name":"Alice"}, {"name":"Bob"}]""")
    assert(keyAt(t, Right(0)) === 2L)
    assert(keyAt(t, Right(0), Left("name")) === 3L)
    assert(keyAt(t, Right(1)) === 4L)
    assert(keyAt(t, Right(1), Left("name")) === 5L)
  }

  test("fused nodekey 7 (IndexVersioningIntegrationTest, FUSE_NAMED_PRIMITIVES)") {
    val t = NodeKeys.build(
      """[{"key":0},{"value":[{"key":{"boolean":true}},{"newkey":"yes"}]},{"key":"hey","value":false}]""")
    // array=1, {"key":0}=2, fused key=3, obj=4, fused value(arr)=5,
    // member obj=6, fused key(obj)=7, fused boolean=8, obj=9,
    // fused newkey=10, obj=11, fused key=12, fused value=13
    assert(keyAt(t, Right(0)) === 2L)
    assert(keyAt(t, Right(1), Left("value"), Right(0), Left("key")) === 7L)
    assert(keyAt(t, Right(1), Left("value"), Right(0), Left("key"),
      Left("boolean")) === 8L)
    assert(keyAt(t, Right(2), Left("value")) === 13L)
    assert(t.maxKey === 13L)
  }

  test("pathOfKey inverts lookup") {
    val t = NodeKeys.build(
      """[{"key":0},{"value":[{"key":{"boolean":true}}]}]""")
    assert(t.pathOfKey(7L) ===
      Some(List(Right(1), Left("value"), Right(0), Left("key"))))
    assert(t.pathOfKey(999L) === None)
  }

  test("printed-path bridge round-trips (array-self [] drops)") {
    val ptr = List(Right(2), Left("test"), Right(0))
    assert(NodeKeys.parsePath(NodeKeys.renderPath(ptr)) === ptr)
    assert(NodeKeys.parsePath("/[2]/test/[]") ===
      List(Right(2), Left("test")))
    assert(NodeKeys.parsePath("") === Nil)
  }

  test("treeCounts: reference pins (GetChildCount/GetDescendantCount)") {
    assert(NodeKeys.treeCounts("""["a", "b", "c"]""") === (3L, 3L))
    assert(NodeKeys.treeCounts("""{"a":1, "b":2}""")._1 === 2L)
    assert(NodeKeys.treeCounts("""{"a": {"b": 1}}""") === (1L, 2L))
    assert(NodeKeys.treeCounts("\"bla\"") === (0L, 0L))
    // 2 member objects + 2 fused fields + 2 array-member primitives
    assert(NodeKeys.treeCounts(
      """[{"key":0},{"value":[1,2]}]""") === (2L, 6L))
  }

  test("same-kind primitive replace keeps the key (set*Value fast path)") {
    val t = NodeKeys.build("""[{"name":"Laptop","price":999}]""")
    val before = keyAt(t, Right(0), Left("price"))
    NodeKeys.applyEdit(t, NodeKeys.Edit("replace",
      List(Right(0), Left("price")), Some("899"), None))
    assert(keyAt(t, Right(0), Left("price")) === before)
    assert(t.maxKey === 4L)
  }

  test("kind-changing replace mints fresh keys from maxKey+1") {
    val t = NodeKeys.build("""[{"name":"Laptop","price":999}]""")
    NodeKeys.applyEdit(t, NodeKeys.Edit("replace",
      List(Right(0), Left("price")), Some("""{"amount":899}"""), None))
    // arr=1 obj=2 name=3 price=4; fresh subtree keys 5 (price), 6 (amount)
    assert(keyAt(t, Right(0), Left("price")) === 5L)
    assert(keyAt(t, Right(0), Left("price"), Left("amount")) === 6L)
    assert(t.maxKey === 6L)
  }

  test("delete keeps sibling keys; append mints fresh; chain maxKey is monotonic") {
    val t = NodeKeys.build("""[{"a":1},{"b":2},{"c":3}]""")
    val cKey = keyAt(t, Right(2))
    NodeKeys.applyEdit(t, NodeKeys.Edit("delete", List(Right(1)), None, None))
    // {"c":3} shifted to index 1 but KEEPS its key
    assert(keyAt(t, Right(1)) === cKey)
    NodeKeys.applyEdit(t, NodeKeys.Edit("append", Nil,
      Some("""{"d":4}"""), None))
    assert(keyAt(t, Right(2)) === 8L) // fresh, not the deleted 4
    assert(keyAt(t, Right(2), Left("d")) === 9L)
  }

  test("rename keeps the node's key") {
    val t = NodeKeys.build("""[{"old":1}]""")
    val k = keyAt(t, Right(0), Left("old"))
    NodeKeys.applyEdit(t, NodeKeys.Edit("rename",
      List(Right(0), Left("old")), Some("\"new\""), None))
    assert(keyAt(t, Right(0), Left("new")) === k)
  }

  test("edits sidecar round-trips") {
    val edits = Seq(
      NodeKeys.Edit("replace", List(Right(0), Left("price")),
        Some("899"), None),
      NodeKeys.Edit("insert", List(Left("items")),
        Some("""{"x":1}"""), Some(2)),
      NodeKeys.Edit("delete", List(Right(1)), None, None))
    val json = NodeKeys.editsToJson(edits)
    assert(NodeKeys.editsFromJson(json) === edits)
  }

  test("pathKeys renders the Hit.path dialect") {
    val t = NodeKeys.build("""[{"a":[1]}]""")
    val m = t.pathKeys.toMap
    assert(m("") === 1L)
    assert(m("/[0]") === 2L)
    assert(m("/[0]/a") === 3L)
    assert(m("/[0]/a/[0]") === 4L)
  }
}
