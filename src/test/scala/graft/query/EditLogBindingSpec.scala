package graft.query

import graft.SparkSpec

/** The edit-log sidecar must BELONG to the revision it sits next to
  * before it replays ([[JsoniqRun.Store.readEditLog]]): each log embeds
  * its writer's reservation token, the commit entry records the same
  * token as writerId, and a mismatch reads as ABSENT — crash residue
  * from a writer that never committed the revision must never replay
  * against someone else's content (silently wrong node keys). */
class EditLogBindingSpec extends SparkSpec {

  private def freshStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("graft-editbind").toString)

  test("update-derived revisions bind their log to the commit's writer") {
    val st = freshStore()
    st.store("c", "d", """{"a": 1, "b": [1, 2]}""")
    JsoniqRun.serialize(st,
      """replace json value of jn:doc('c','d').a with 9""")
    // the log exists, carries a token, and that token matches the
    // committed revision's writerId — so it replays
    val path = st.docPath("c", "d")
    val (writer, edits) = NodeKeys.editsEnvelopeFromJson(
      graft.sources.MetaIO.readString(st.editsPath(path, 2)))
    assert(writer.isDefined)
    assert(edits.nonEmpty)
    assert(graft.sources.TemporalTable.commitWriterId(path, 2) === writer)
    assert(st.readEditLog("c", "d", 2).exists(_.nonEmpty))
    // keys stable across the replace: 'b' keeps its pre-update key
    assert(JsoniqRun.serialize(st, "sdb:nodekey(jn:doc('c','d').b)") ===
      NodeKeys.build("""{"a": 1, "b": [1, 2]}""")
        .lookup(List(Left("b"))).map(_.key).get.toString)
  }

  test("a stale log with a foreign token reads as absent, loudly") {
    val st = freshStore()
    st.store("c", "d", """{"a": 1}""")
    st.store("c", "d", """{"z": true, "a": 1}""") // fresh re-store, no log
    val path = st.docPath("c", "d")
    // simulate crash residue: a NON-EMPTY log parked at committed rev 2
    // by a writer that never owned it
    graft.sources.MetaIO.writeStringOverwrite(st.editsPath(path, 2),
      NodeKeys.editsToJson(Seq(NodeKeys.Edit("delete",
        List(Left("a")), None, None)), Some("not-the-committer")))
    st.evictEditState(path, 2)
    assert(st.readEditLog("c", "d", 2).isEmpty)
    // fresh numbering of rev 2's own content — the residue's delete
    // never replays (it would have dropped 'a' and shifted nothing)
    assert(JsoniqRun.serialize(st, "sdb:nodekey(jn:doc('c','d').a)") ===
      NodeKeys.build("""{"z": true, "a": 1}""")
        .lookup(List(Left("a"))).map(_.key).get.toString)
  }

  test("a tokenless legacy log still replays") {
    val st = freshStore()
    st.store("c", "d", """{"a": 1, "b": 2}""")
    JsoniqRun.serialize(st,
      """replace json value of jn:doc('c','d').a with {"n": 3}""")
    val path = st.docPath("c", "d")
    // rewrite rev 2's log in the pre-token bare-array layout
    val edits = st.readEditLog("c", "d", 2).get
    graft.sources.MetaIO.writeStringOverwrite(st.editsPath(path, 2),
      NodeKeys.editsToJson(edits).replaceAll(
        """^\{"edits":""", "").stripSuffix("}"))
    st.evictEditState(path, 2)
    assert(st.readEditLog("c", "d", 2).exists(_.nonEmpty))
    // replay semantics intact: kind-changing replace re-mints 'a'
    val base = NodeKeys.build("""{"a": 1, "b": 2}""")
    assert(JsoniqRun.serialize(st, "sdb:nodekey(jn:doc('c','d').a)")
      .toLong > base.maxKey)
    assert(JsoniqRun.serialize(st, "sdb:nodekey(jn:doc('c','d').b)") ===
      base.lookup(List(Left("b"))).map(_.key).get.toString)
  }

  test("sdb:commit clears a crash-orphaned log at its reserved number") {
    val st = freshStore()
    st.store("c", "d", """{"a": [1, 2, 3]}""")
    val path = st.docPath("c", "d")
    // residue parked at the number sdb:commit will reserve (rev 2)
    graft.sources.MetaIO.createNew(st.editsPath(path, 2),
      NodeKeys.editsToJson(Seq(NodeKeys.Edit("delete",
        List(Left("a")), None, None)), Some("crashed-writer")))
    st.evictEditState(path, 2)
    val rev = JsoniqRun.serialize(st, "sdb:commit(jn:doc('c','d'))")
    assert(rev === "2")
    // the committed log is the EMPTY one, bound to the committer
    assert(st.readEditLog("c", "d", 2).exists(_.isEmpty))
    assert(JsoniqRun.serialize(st, "sdb:nodekey(jn:doc('c','d').a)") ===
      NodeKeys.build("""{"a": [1, 2, 3]}""")
        .lookup(List(Left("a"))).map(_.key).get.toString)
  }

  test("an update landing on a number with residue clears it first") {
    val st = freshStore()
    st.store("c", "d", """{"a": 1, "b": 2}""")
    val path = st.docPath("c", "d")
    graft.sources.MetaIO.createNew(st.editsPath(path, 2),
      NodeKeys.editsToJson(Seq(NodeKeys.Edit("delete",
        List(Left("b")), None, None)), Some("crashed-writer")))
    st.evictEditState(path, 2)
    JsoniqRun.serialize(st,
      "replace json value of jn:doc('c','d').a with 7")
    // exactly OUR replace in the log — not the residue's delete
    val edits = st.readEditLog("c", "d", 2).get
    assert(edits.map(_.kind) === Seq("replace"))
    assert(JsoniqRun.serialize(st, "sdb:nodekey(jn:doc('c','d').b)") ===
      NodeKeys.build("""{"a": 1, "b": 2}""")
        .lookup(List(Left("b"))).map(_.key).get.toString)
  }
}
