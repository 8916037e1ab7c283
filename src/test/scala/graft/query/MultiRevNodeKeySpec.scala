package graft.query

import graft.SparkSpec

/** Per-row node-key resolution over frames that reference SEVERAL
  * revisions (jn:all-times / jn:past bindings): shred-eligible
  * revisions serve through the distributed layout (one filtered branch
  * per revision), the rest broadcast their tree's (path, key) pairs —
  * and the driver bytes of that whole sweep charge against the
  * node-identity cap up front (a near-cap document with a long history
  * fails LOUDLY, never OOMs the driver mid-broadcast). */
class MultiRevNodeKeySpec extends SparkSpec {

  private def freshStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("graft-mrnk").toString)

  // non-root arrays shred only at >= 16 members
  private val rev1 = """{"a": {"x": 1}, "items": [""" +
    (1 to 20).mkString(",") + """], "b": 2}"""
  private val rev2 = """{"z": true, "a": {"x": 1}, "items": [""" +
    (1 to 21).mkString(",") + """], "b": 3}"""

  test("all-times nodekeys resolve per revision") {
    val st = freshStore()
    st.store("c", "d", rev1)
    st.store("c", "d", rev2) // fresh re-store: keys renumber
    val got = JsoniqRun.serialize(st,
      "for $n in jn:all-times(jn:doc('c','d')) return sdb:nodekey($n.a)")
    val k1 = NodeKeys.build(rev1).lookup(List(Left("a"))).map(_.key).get
    val k2 = NodeKeys.build(rev2).lookup(List(Left("a"))).map(_.key).get
    assert(got === s"$k1 $k2")
    assert(k1 !== k2) // the revisions genuinely disagree
  }

  test("mixed shredded/unshredded revision sweeps agree with plain") {
    val st = freshStore()
    st.store("c", "d", rev1) // default threshold: unshredded
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      st.store("c", "d", rev2) // shredded
      assert(st.shredEntries("c", "d", Some(1)).isEmpty)
      assert(st.shredEntries("c", "d", Some(2)).nonEmpty)
      val got = JsoniqRun.serialize(st,
        "for $n in jn:all-times(jn:doc('c','d')) return sdb:nodekey($n.a)")
      val k1 = NodeKeys.build(rev1).lookup(List(Left("a"))).map(_.key).get
      val k2 = NodeKeys.build(rev2).lookup(List(Left("a"))).map(_.key).get
      assert(got === s"$k1 $k2")
      // a deep member pointer through the shredded revision's layout
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:doc('c','d').items[3])") ===
        NodeKeys.build(rev2).lookup(List(Left("items"), Right(3)))
          .map(_.key).get.toString)
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("a long-history sweep past the cap fails loudly, never OOMs") {
    val st = freshStore()
    val body = (1 to 50).map(i => s""""f$i": $i""").mkString("{", ",", "}")
    (1 to 4).foreach(_ => st.store("c", "h", body))
    val prev = sys.props.get("graft.nodekeys.maxDriverBytes")
    // each revision is UNDER the cap, the 4-revision sweep is over it
    sys.props("graft.nodekeys.maxDriverBytes") = (body.length * 2).toString
    try {
      val e = intercept[UnsupportedOperationException](
        JsoniqRun.serialize(st,
          "for $n in jn:all-times(jn:doc('c','h')) return sdb:nodekey($n.f7)"))
      assert(e.getMessage.contains("revisions"))
      assert(e.getMessage.contains("maxDriverBytes"))
    } finally prev match {
      case Some(v) => sys.props("graft.nodekeys.maxDriverBytes") = v
      case None => sys.props.remove("graft.nodekeys.maxDriverBytes"); ()
    }
  }
}
