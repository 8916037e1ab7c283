package graft.query

import graft.SparkSpec

/** The printed-path dialect must be collision-free: a field literally
  * named `a/b`, `[0]` or `~x` is legal JSON (the reference's path
  * classes store name keys, never rendered strings) — node identity
  * over such fields must resolve to the RIGHT node, not to whatever
  * the rendered string happens to collide with. */
class PathDialectEscapeSpec extends SparkSpec {

  test("escSeg/unescSeg round-trip every special character") {
    Seq("a/b", "[0]", "[]", "~", "~0", "a~1b", "x[3]/y~", "plain")
      .foreach { f =>
        assert(NodeKeys.unescSeg(NodeKeys.escSeg(f)) === f, f)
      }
    // rendered paths parse back to the same pointer
    val ptr = List(Left("a/b"), Right(3), Left("[0]"),
      Left("~"), Left("plain")): List[Either[String, Int]]
    assert(NodeKeys.parsePath(NodeKeys.renderPath(ptr)) === ptr)
    // a literal "[3]" field renders DIFFERENTLY from index 3
    assert(NodeKeys.renderPath(List(Left("[3]"))) !==
      NodeKeys.renderPath(List(Right(3))))
  }

  test("nodekey -> select-item round-trips fields named like the dialect") {
    val st = new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("graft-escape").toString)
    val doc = """{"a/b": {"x": 1}, "[0]": "tricky", "a": {"b": 2}, """ +
      """"arr": [10, 20]}"""
    st.store("c", "d", doc)
    val truth = NodeKeys.build(doc)
    def key(p: Either[String, Int]*): Long =
      truth.lookup(p.toList).map(_.key).get
    // WITHOUT escaping, "a/b"'s rendered path /a/b collides with the
    // real chain a -> b; the keys must differ
    assert(key(Left("a/b")) !== key(Left("a"), Left("b")))
    // deref of the quoted field resolves the escaped identity
    assert(JsoniqRun.serialize(st,
      """sdb:nodekey(jn:doc('c','d')."a/b")""").toLong === key(Left("a/b")))
    assert(JsoniqRun.serialize(st,
      """sdb:nodekey(jn:doc('c','d')."a/b".x)""").toLong ===
      key(Left("a/b"), Left("x")))
    assert(JsoniqRun.serialize(st,
      """sdb:nodekey(jn:doc('c','d')."[0]")""").toLong === key(Left("[0]")))
    assert(JsoniqRun.serialize(st,
      "sdb:nodekey(jn:doc('c','d').a.b)").toLong ===
      key(Left("a"), Left("b")))
    // select-item inverts back to the right VALUES
    assert(JsoniqRun.serialize(st,
      s"jn:select-json-item(jn:doc('c','d'), ${key(Left("[0]"))})") ===
      "\"tricky\"")
    assert(JsoniqRun.serialize(st,
      s"jn:select-json-item(jn:doc('c','d'), ${key(Left("a/b"), Left("x"))})")
      === "1")
    assert(JsoniqRun.serialize(st,
      s"jn:select-json-item(jn:doc('c','d'), ${key(Left("a"), Left("b"))})")
      === "2")
  }
}
