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
