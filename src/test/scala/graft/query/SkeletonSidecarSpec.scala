package graft.query

import graft.SparkSpec

/** The persisted skeleton sidecar (r15, VERDICT Missing #5): stores at
  * or above `graft.skeleton.sidecarMin` write `_skeleton.json` — the
  * document text with each json-chain array spliced out for a slot
  * marker — so index scans over an OVER-CAP document serve
  * skeleton+members WITHOUT ever reading the text. NAME scans (whose
  * skeleton hits were previously unprovable without the document) are
  * the headline family; the reference's name index answers at any size
  * (index/name/NameFilter.java:12). */
class SkeletonSidecarSpec extends SparkSpec {

  private def withProps[A](props: (String, String)*)(body: => A): A = {
    val prev = props.map { case (k, _) => k -> sys.props.get(k) }
    props.foreach { case (k, v) => sys.props(k) = v }
    try body
    finally prev.foreach {
      case (k, Some(v)) => sys.props(k) = v
      case (k, None) => sys.props.remove(k); ()
    }
  }

  private val doc = """{"meta": {"name": "corpus", "v": -1}, "items": [""" +
    (1 to 30).map(i => s"""{"v": $i, "w": {"x": ${i % 3}}}""")
      .mkString(",") +
    """], "tags": [""" +
    (1 to 20).map(i => s""""t$i"""").mkString(",") + """], "tail": 9}"""

  test("name/descendant scans over an over-cap document serve via the sidecar") {
    withProps("graft.shred.min" -> "1", "graft.skeleton.sidecarMin" -> "1") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sksc").toString
      val st0 = new JsoniqRun.Store(spark, dir)
      st0.store("c", "d", doc)
      assert(st0.hasSkeletonSidecar("c", "d", 1), "sidecar must persist")
      // baseline answers with the document readable
      val queries = Seq(
        "count(jn:scan-name-index(jn:doc('c','d'), 0, 'v'))",
        "for $n in jn:scan-name-index(jn:doc('c','d'), 0, 'name') return $n",
        "count(jn:scan-path-index(jn:doc('c','d'), 0, '//v'))",
        "count(jn:scan-cas-index(jn:doc('c','d'), 0, 20, '>', '/items/[]/v'))",
        // a skeleton-level CAS hit (meta.v) must surface too
        "jn:scan-cas-index(jn:doc('c','d'), 0, 0, '<', '/meta/v')")
      val want = queries.map(q => JsoniqRun.serialize(st0, q))
      // FRESH store instance (cold caches) + the doc walk fenced to 1
      // byte: every answer must come from sidecar + member tables
      val st = new JsoniqRun.Store(spark, dir)
      withProps("graft.scan.maxDriverBytes" -> "1") {
        queries.zip(want).foreach { case (q, w) =>
          assert(JsoniqRun.serialize(st, q) === w, q)
        }
        // hits that would need the ELIDED CONTENT itself stay LOUD at
        // over-cap, never silent: a path pattern matching the shredded
        // array node, and a name scan hitting a chain-field key
        // ('items'/'tags' via the all-names form) whose hit content IS
        // the members
        intercept[IllegalStateException](JsoniqRun.serialize(st,
          "count(jn:scan-path-index(jn:doc('c','d'), 0, '/items/[]'))"))
        intercept[IllegalStateException](JsoniqRun.serialize(st,
          "count(jn:scan-name-index(jn:doc('c','d'), 0, ()))"))
      }
    }
  }

  test("a chain nested after an earlier marker sibling still registers (taint short-circuit)") {
    // Regression (r16 ADVICE #1): walk used `taint ||= walk(v)`, which
    // short-circuits once taint is true — a slot marker nested at depth
    // >= 2 AFTER an earlier marker sibling was never registered, so its
    // chain's member hits were silently dropped (or the literal marker
    // object served as content).
    withProps("graft.shred.min" -> "1", "graft.skeleton.sidecarMin" -> "1") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sksc3").toString
      val nested = """{"a": [""" +
        (1 to 25).map(i => s"""{"v": $i}""").mkString(",") +
        """], "b": {"c": [""" +
        (101 to 125).map(i => s"""{"v": $i}""").mkString(",") +
        """]}, "tail": 7}"""
      val st0 = new JsoniqRun.Store(spark, dir)
      st0.store("c", "d", nested)
      assert(st0.hasSkeletonSidecar("c", "d", 1), "sidecar must persist")
      val queries = Seq(
        // hits from BOTH chains, the second one nested under b
        "count(jn:scan-name-index(jn:doc('c','d'), 0, 'v'))",
        "count(jn:scan-cas-index(jn:doc('c','d'), 0, 100, '>', '//v'))",
        "count(jn:scan-path-index(jn:doc('c','d'), 0, '/b/c/[]/v'))")
      val want = queries.map(q => JsoniqRun.serialize(st0, q))
      assert(want.head === "50", "baseline must count both chains")
      val st = new JsoniqRun.Store(spark, dir)
      withProps("graft.scan.maxDriverBytes" -> "1") {
        queries.zip(want).foreach { case (q, w) =>
          assert(JsoniqRun.serialize(st, q) === w, q)
        }
        // the marker key must never surface as content
        val allV = JsoniqRun.serialize(st,
          "for $n in jn:scan-name-index(jn:doc('c','d'), 0, 'v') return $n")
        assert(!allV.contains("~graft-slot"), "marker served as content")
      }
    }
  }

  test("the sidecar survives member-local fast commits and copy-commits") {
    withProps("graft.shred.min" -> "1", "graft.skeleton.sidecarMin" -> "1") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sksc2").toString
      val st = new JsoniqRun.Store(spark, dir)
      st.store("c", "d", doc)
      JsoniqRun.serialize(st,
        """replace json value of jn:doc('c','d').items[3].v with 999""")
      assert(st.isMemberLocalCommit("c", "d", 2))
      assert(st.hasSkeletonSidecar("c", "d", 2))
      JsoniqRun.serialize(st, "sdb:commit(jn:doc('c','d'))")
      assert(st.hasSkeletonSidecar("c", "d", 3))
      // fenced serving over the fast-committed revision sees the patch
      val st2 = new JsoniqRun.Store(spark, dir)
      withProps("graft.scan.maxDriverBytes" -> "1") {
        assert(JsoniqRun.serialize(st2,
          "count(jn:scan-cas-index(jn:doc('c','d'), 0, 900, '>', '/items/[]/v'))")
          === "1")
      }
    }
  }
}
