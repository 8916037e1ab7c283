package graft.query

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** Differential replay of XMark queries from the reference's corpus
  * (bundles/sirix-query/src/test/resources/xmark/) against its own
  * pinned results (results/qNN.out): auction.xml converts to the
  * [[XmlItem]] encoding once, each query text runs VERBATIM with the
  * document as the context item. String results surface JSON-quoted
  * (the front end serializes JSON items); numbers match byte-for-byte. */
class XmarkSpec extends SparkSpec {

  private val XmarkDir =
    "/root/reference/bundles/sirix-query/src/test/resources/xmark"

  private lazy val harness: Option[(JsoniqRun.Store, String)] =
    if (!Files.isDirectory(Paths.get(XmarkDir))) None
    else {
      val xml = new String(
        Files.readAllBytes(Paths.get(s"$XmarkDir/auction.xml")), "UTF-8")
      val st = new JsoniqRun.Store(spark,
        Files.createTempDirectory("graft-xmark").toString)
      Some((st, st.storeXml("xmark", "auction.xml", xml)))
    }

  private def queryText(name: String): String = new String(
    Files.readAllBytes(Paths.get(s"$XmarkDir/queries/orig/$name.xq")), "UTF-8")
  private def pinned(name: String): String = new String(
    Files.readAllBytes(Paths.get(s"$XmarkDir/results/$name.out")), "UTF-8").trim

  private def check(name: String, adapt: String => String = identity): Unit =
    harness match {
      case None => cancel("reference XMark corpus not present")
      case Some((st, ctx)) =>
        val got = JsoniqRun.serialize(st, queryText(name), Some(ctx))
        assert(got == adapt(pinned(name)), s"$name: got $got")
    }

  test("xmark q01: person lookup by attribute predicate") {
    check("q01", p => "\"" + p + "\"") // text item -> JSON string
  }
  test("xmark q05: count over predicate on text value")(check("q05"))
  test("xmark q06: descendant step count")(check("q06"))
  test("xmark q07: summed descendant counts")(check("q07"))

  /** Split a concatenation of sibling XML elements (depth-balanced). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var from = 0
    var i = 0
    while (i < s.length) {
      if (s(i) == '<') {
        val close = s(i + 1) == '/'
        val gt = s.indexOf('>', i)
        val selfClosing = s(gt - 1) == '/'
        if (close) depth -= 1 else if (!selfClosing) depth += 1
        i = gt + 1
        if (depth == 0) { out += s.substring(from, i); from = i }
      } else i += 1
    }
    out.result()
  }

  private def checkXml(name: String): Unit = harness match {
    case None => cancel("reference XMark corpus not present")
    case Some((st, ctx)) =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val got = JsoniqRun.run(st, queryText(name), Some(ctx))
        .collect().map(r => mapper.readValue(r.getString(1), classOf[String]))
        .toSeq
      assert(got == splitTopLevel(pinned(name)),
        s"$name: ${got.take(2)} vs ${splitTopLevel(pinned(name)).take(2)}")
  }

  test("xmark q02: element construction over positional bidder[1]") {
    checkXml("q02") // 120 <increase> elements incl. self-closed empties
  }
  test("xmark q03: [1]/[last()] attribute templates with arithmetic") {
    checkXml("q03")
  }
  test("xmark q14: full-text contains over element string-values") {
    harness match {
      case None => cancel("reference XMark corpus not present")
      case Some((st, ctx)) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val got = JsoniqRun.run(st, queryText("q14"), Some(ctx))
          .collect().map(r => mapper.readValue(r.getString(1), classOf[String]))
        // the reference concatenates adjacent text items directly (the
        // fixture's name texts carry their own trailing spaces)
        val raw = new String(Files.readAllBytes(
          Paths.get(s"$XmarkDir/results/q14.out")), "UTF-8")
        assert(got.mkString("") == raw, got.take(2).toSeq)
    }
  }
  test("xmark q15: deep child-path chain into keyword text")(checkXml("q15"))
  test("xmark q16: non-empty deep path filter, attr-templated empty element") {
    checkXml("q16")
  }
  test("xmark q17: empty() filter over text steps")(checkXml("q17"))
  test("xmark q19: order by element string-value with empty greatest") {
    checkXml("q19")
  }

  // The formerly-slow correlated set (q08/q11/q12 person/auction joins,
  // q20's four counted predicate walks) now compiles through the
  // static-hoist + in-row sequence (HOF) path — the walks evaluate once
  // on the 1-row static frame and the correlated lets become codegen'd
  // array filters, a few seconds each instead of 40-120 s.
  test("xmark q08: correlated count per person")(checkXml("q08"))
  test("xmark q11: correlated value-comparison let")(checkXml("q11"))
  test("xmark q12: correlated let with outer where")(checkXml("q12"))
  test("xmark q20: counted predicate partitions")(checkXml("q20"))
  test("xmark q09: triple-correlated person/auction/item join") {
    checkXml("q09")
  }
  test("xmark q18: declared function inlined at call site")(check("q18"))
  test("xmark q13: stored subtree re-serialization, byte-exact") {
    checkXml("q13")
  }
  test("xmark q10: grouped person profiles per interest category") {
    checkXml("q10")
  }

  test("xmark q04: some..satisfies with document-order <<") {
    // the reference pins an EMPTY result for this seed (q04.out is
    // empty); the quantifier/<< machinery is positively pinned below
    check("q04", _ => "")
  }

  test("quantified expressions and document order on a controlled doc") {
    val json = XmlItem.xmlToJson(
      "<r><a><p ref=\"x\"/><p ref=\"y\"/></a><b><p ref=\"y\"/><p ref=\"x\"/></b></r>")
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-quant").toString)
    // in <a> the x-ref precedes the y-ref; in <b> it follows
    assert(JsoniqRun.serialize(st,
      """count(./r/a[some $p1 in ./p[@ref = "x"], $p2 in ./p[@ref = "y"] satisfies $p1 << $p2])""",
      Some(json)) == "1")
    assert(JsoniqRun.serialize(st,
      """count(./r/b[some $p1 in ./p[@ref = "x"], $p2 in ./p[@ref = "y"] satisfies $p1 << $p2])""",
      Some(json)) == "0")
  }

  test("xml item encoding round-trips structure, order, and attributes") {
    val json = XmlItem.xmlToJson(
      "<a x=\"1\"><b>t1</b><c><b y=\"z\">t2</b></c>tail</a>")
    // document wrapper -> root element 'a'
    assert(json.startsWith("{\"~n\":\"\""))
    assert(XmlItem.walkElements(json, "b").size == 2)
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-xmlitem").toString)
    assert(JsoniqRun.serialize(st, "count(./a//b)", Some(json)) == "2")
    assert(JsoniqRun.serialize(st, "./a/c/b/text()", Some(json)) == "\"t2\"")
    assert(JsoniqRun.serialize(st, "./a/c/b[@y = \"z\"]/text()", Some(json))
      == "\"t2\"")
    assert(JsoniqRun.serialize(st, "count(./a/b[@y = \"z\"])", Some(json)) == "0")
    assert(JsoniqRun.serialize(st, "./a/text()", Some(json)) == "\"tail\"")
  }
}
