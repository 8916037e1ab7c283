package graft.query

import graft.SparkSpec

import java.nio.file.Files

/** Textual routes added round 13 beyond node identity: the xml:
  * function family's storage + node surface (reference function/xml/
  * XMLFun.java registrations), commit-metadata sdb:author-id
  * (GetAuthorID.java), and sdb:rollback's reference-matching refusal
  * (Rollback.java throws on a non-write transaction — this engine's
  * textual updates auto-commit, so nothing is ever open). */
class FunctionRoutesSpec extends SparkSpec {

  private def freshStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-fr").toString)

  private def run(st: JsoniqRun.Store, q: String): String =
    JsoniqRun.serialize(st, q)

  test("xml:store + xml:doc + xml:serialize roundtrip") {
    val st = freshStore()
    run(st, """xml:store('col','doc.xml','<a b="1"><c>x</c><d/></a>')""")
    assert(run(st, "xml:serialize(xml:doc('col','doc.xml'))")
      === "\"<a b=\\\"1\\\"><c>x</c><d/></a>\"")
  }

  test("xml:doc navigates with the XPath-lite steps") {
    val st = freshStore()
    run(st, """xml:store('col','doc.xml','<a b="1"><c>x</c><d/></a>')""")
    assert(run(st, "xml:doc('col','doc.xml')/a/c/text()") === "\"x\"")
  }

  test("xml:attribute-count counts attributes; namespace-count is 0") {
    val st = freshStore()
    run(st, """xml:store('col','doc.xml','<a b="1" e="2"><c>x</c></a>')""")
    assert(run(st,
      "xml:attribute-count(xml:doc('col','doc.xml')/a)") === "2")
    assert(run(st,
      "xml:attribute-count(xml:doc('col','doc.xml')/a/c)") === "0")
    assert(run(st,
      "xml:namespace-count(xml:doc('col','doc.xml')/a)") === "0")
  }

  test("child/descendant counts over XML items count structural nodes") {
    val st = freshStore()
    run(st, """xml:store('col','doc.xml','<a b="1"><c>x</c><d/></a>')""")
    // document node: 1 child (the root element); descendants: a, c,
    // "x", d = 4. Element a: 2 children (c, d), 3 descendants.
    assert(run(st,
      "sdb:child-count(xml:doc('col','doc.xml'))") === "1")
    assert(run(st,
      "sdb:descendant-count(xml:doc('col','doc.xml'))") === "4")
    assert(run(st,
      "sdb:child-count(xml:doc('col','doc.xml')/a)") === "2")
    assert(run(st,
      "sdb:descendant-count(xml:doc('col','doc.xml')/a)") === "3")
  }

  test("xml:load ingests from a file URI; xml:open reads as-of") {
    val st = freshStore()
    val f = Files.createTempFile("graft-xml-load", ".xml")
    Files.write(f, "<r><a>1</a></r>".getBytes("UTF-8"))
    run(st, s"xml:load('col','loaded.xml','${f.toUri}')")
    assert(run(st, "xml:doc('col','loaded.xml')/r/a/text()") === "\"1\"")
    // as-of read through the shared commit-log machinery
    val ts = run(st, "sdb:timestamp(xml:doc('col','loaded.xml'))")
      .stripPrefix("\"").stripSuffix("\"")
    run(st, """xml:store('col','loaded.xml','<r><a>2</a></r>')""")
    assert(run(st, s"xml:open('col','loaded.xml','$ts')/r/a/text()")
      === "\"1\"")
    assert(run(st, "xml:doc('col','loaded.xml')/r/a/text()") === "\"2\"")
  }

  test("sdb:author-id is the commit author's deterministic UUID") {
    val st = freshStore()
    run(st, """jn:store('c','d','["x"]')""")
    val expected = java.util.UUID.nameUUIDFromBytes(
      "graft-user:graft".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .toString
    assert(run(st, "sdb:author-id(jn:doc('c','d'))") === s""""$expected"""")
    // stays in lockstep with the name route
    assert(run(st, "sdb:author-name(jn:doc('c','d'))") === "\"graft\"")
  }

  test("nested fn:substring keeps the outer call's columns (r16 ADVICE)") {
    // Regression: the substring cleanup dropped EVERY `__sub*` column,
    // so an inner substring nested in another substring's argument
    // stripped the outer call's still-referenced gensyms — a valid
    // query failed with an unresolved-column error.
    val st = freshStore()
    run(st, """jn:store('c','d','{"t":"abcdefgh"}')""")
    assert(run(st,
      "substring(substring(jn:doc('c','d').t, 2), 2, 3)") === "\"cde\"")
    assert(run(st,
      "substring(jn:doc('c','d').t, string-length(substring(jn:doc('c','d').t, 6)), 2)")
      === "\"cd\"")
    // substring in BOTH the source and position arguments
    assert(run(st,
      "substring(substring(jn:doc('c','d').t, 2, 6), string-length(substring(jn:doc('c','d').t, 7)), 3)")
      === "\"cde\"")
  }

  test("jn:keys/jn:values surface INSERTION order (brackit JSONFun)") {
    // r16 (VERDICT Missing #3): the reference iterates object members
    // as written; order comes from the items' original text, not the
    // key-sorting variant encoding
    val st = freshStore()
    run(st,
      """jn:store('c','d','{"zeta":1,"alpha":{"m":2,"b":3},"beta":[{"y":1,"x":2},{"q":0,"p":9}]}')""")
    assert(run(st, "jn:keys(jn:doc('c','d'))") === "\"zeta\" \"alpha\" \"beta\"")
    assert(run(st, "jn:values(jn:doc('c','d'))") ===
      "1 {\"b\":3,\"m\":2} [{\"x\":2,\"y\":1},{\"p\":9,\"q\":0}]")
    assert(run(st, "jn:keys(jn:doc('c','d').alpha)") === "\"m\" \"b\"")
    assert(run(st, "jn:values(jn:doc('c','d').alpha)") === "2 3")
    assert(run(st, "jn:keys(jn:doc('c','d').beta[])") ===
      "\"y\" \"x\" \"q\" \"p\"")
    assert(run(st, "jn:keys(jn:doc('c','d').beta[1])") === "\"q\" \"p\"")
    // literal constructors keep written order too
    assert(run(st, """jn:keys({"w":1,"c":2})""") === "\"w\" \"c\"")
    assert(run(st, """jn:values({"w":1,"c":2})""") === "1 2")
    // first-occurrence dedup across an unboxed sequence
    run(st, """jn:store('c','e','[{"z":1,"a":2},{"a":9,"b":1}]')""")
    assert(run(st, "jn:keys(jn:doc('c','e')[])") === "\"z\" \"a\" \"b\"")
  }

  test("insertion-order keys serve distributed over shredded members") {
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val st = freshStore()
      // >= 16 members so the chain shreds; keys deliberately unsorted
      val items = (1 to 20)
        .map(i => s"""{"w$i":$i,"v$i":${i * 10}}""").mkString(",")
      run(st,
        s"""jn:store('c','d','{"meta":{"z":0,"a":1},"items":[$items]}')""")
      assert(st.shredEntries("c", "d", None).exists(_.steps == List("items")))
      // chain[] unbox = member_raw rows, any document size
      assert(run(st, "jn:keys(jn:doc('c','d').items[])") ===
        (1 to 20).map(i => s""""w$i" "v$i"""").mkString(" "))
      assert(run(st, "jn:values(jn:doc('c','d').items[1])") === "2 20")
      // over-cap: the skeleton sidecar answers keys without the text
      val prevCap = sys.props.get("graft.scan.maxDriverBytes")
      val prevSk = sys.props.get("graft.skeleton.sidecarMin")
      sys.props("graft.skeleton.sidecarMin") = "1"
      try {
        val st2 = freshStore()
        JsoniqRun.serialize(st2,
          s"""jn:store('c','d','{"meta":{"z":0,"a":1},"items":[$items]}')""")
        assert(st2.hasSkeletonSidecar("c", "d", 1))
        sys.props("graft.scan.maxDriverBytes") = "1"
        val st3 = new JsoniqRun.Store(spark, st2.baseDir)
        assert(JsoniqRun.serialize(st3, "jn:keys(jn:doc('c','d').meta)") ===
          "\"z\" \"a\"")
        assert(JsoniqRun.serialize(st3, "jn:keys(jn:doc('c','d'))") ===
          "\"meta\" \"items\"")
        assert(JsoniqRun.serialize(st3, "jn:keys(jn:doc('c','d').items[])")
          === (1 to 20).map(i => s""""w$i" "v$i"""").mkString(" "))
      } finally {
        prevCap match {
          case Some(v) => sys.props("graft.scan.maxDriverBytes") = v
          case None => sys.props.remove("graft.scan.maxDriverBytes"); ()
        }
        prevSk match {
          case Some(v) => sys.props("graft.skeleton.sidecarMin") = v
          case None => sys.props.remove("graft.skeleton.sidecarMin"); ()
        }
      }
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("sdb:rollback refuses: no open write transaction (Rollback.java)") {
    val st = freshStore()
    run(st, """jn:store('c','d','["original"]')""")
    val e = intercept[UnsupportedOperationException](run(st,
      "sdb:rollback(jn:doc('c','d'))"))
    assert(e.getMessage.contains("not a write transaction"))
    // the stored data is untouched (RollbackTest's observable contract)
    assert(run(st, "jn:doc('c','d')") === """["original"]""")
  }
}
