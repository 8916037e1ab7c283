package graft.query

import graft.SparkSpec

import java.nio.file.Files

/** Verbatim replays of the reference's sdb/trx function tests over the
  * CANONICAL sirix test document (JsonDocumentCreator.JSON —
  * `{"foo":["bar",null,2.33],...}`): GetPathTest's
  * `sdb:path(sdb:select-item(...))` compositions with the reference's
  * own FUSED-mode node keys (its comments pin 17/8/14/19 after the
  * iter#32 fusion), GetHashTest's select-item hash, and the key
  * numbering of an update-inserted subtree (fresh keys from maxKey+1 —
  * JsonNodeTrxImpl's insertion discipline).
  *
  * One documented rendering divergence: the reference's GetPath prints
  * an array MEMBER that is itself an array as `/tada/[]/[4]`
  * (path-summary class step before the index); this engine renders the
  * engine-wide Hit.path convention `/tada/[4]/[]` (concrete member
  * step, the array node's own trailing `/[]`) — the same convention
  * its scan pins (testCreateAndScanPathIndex) use on BOTH engines. */
class SdbTrxReplaySpec extends SparkSpec {

  private val Doc =
    """{"foo":["bar",null,2.33],"bar":{"hello":"world","helloo":true},"baz":"hello","tada":[{"foo":"bar"},{"baz":false},"boo",{},[]]}"""

  private def freshStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-sdbtrx").toString)

  private def storeWithInsert(): JsoniqRun.Store = {
    val st = freshStore()
    JsoniqRun.serialize(st,
      s"jn:store('json-path1','shredded','${Doc.replace("'", "''")}')")
    // GetPathTest's low-level insertSubtreeAsRightSibling of {"foo":[]}
    // after foo[2] — textually an at-position array insert
    JsoniqRun.serialize(st,
      """insert json {"foo": []} into jn:doc('json-path1','shredded').foo at position 3""")
    st
  }

  test("GetPathTest: fused keys 8/14/19 print the reference's paths") {
    val st = storeWithInsert()
    assert(JsoniqRun.serialize(st,
      "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 8))")
      === "\"/bar/helloo\"")
    assert(JsoniqRun.serialize(st,
      "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 14))")
      === "\"/tada/[1]/baz\"")
    assert(JsoniqRun.serialize(st,
      "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 19))")
      === "\"/foo/[3]/foo/[]\"")
  }

  test("GetPathTest key 17: same node, engine-convention rendering") {
    val st = storeWithInsert()
    // the reference prints /tada/[]/[4]; same node (tada's 5th member,
    // the empty array), this engine's concrete-step convention
    assert(JsoniqRun.serialize(st,
      "sdb:path(sdb:select-item(jn:doc('json-path1','shredded'), 17))")
      === "\"/tada/[4]/[]\"")
    // and the selected node really is that empty array
    assert(JsoniqRun.serialize(st,
      "sdb:select-item(jn:doc('json-path1','shredded'), 17)") === "[]")
  }

  test("GetHashTest: hash of doc and of a by-key selection") {
    val st = freshStore()
    JsoniqRun.serialize(st,
      """jn:store('json-path1','mydoc.jn','["bla", "blubb"]')""")
    val h1 = JsoniqRun.serialize(st,
      "sdb:hash(jn:doc('json-path1','mydoc.jn'))")
    val h2 = JsoniqRun.serialize(st,
      "sdb:hash(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 2))")
    assert(h1.nonEmpty && h2.nonEmpty && h1 != h2)
    // equal content <=> equal hash (the only property queries rely on)
    assert(JsoniqRun.serialize(st,
      "sdb:hash(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 2)) eq " +
        "sdb:hash(sdb:select-item(jn:doc('json-path1','mydoc.jn'), 2))")
      === "true")
  }

  test("inserted subtrees number from maxKey+1 (insertion discipline)") {
    val st = storeWithInsert()
    // original doc's maxKey is 17; the inserted {"foo":[]} takes 18
    // (object) and 19 (fused foo array)
    assert(JsoniqRun.serialize(st,
      "sdb:nodekey(jn:doc('json-path1','shredded').foo[3])") === "18")
    assert(JsoniqRun.serialize(st,
      "sdb:nodekey(jn:doc('json-path1','shredded').foo[3].foo)") === "19")
    // pre-existing nodes keep their keys
    assert(JsoniqRun.serialize(st,
      "sdb:nodekey(jn:doc('json-path1','shredded').tada)") === "10")
  }
}
