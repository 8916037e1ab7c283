package graft.query

import graft.SparkSpec

/** The fused StAX encode+span pass ([[XmlItem.xmlToJsonSpans]]) against
  * the generic scanners it replaced: encodings must stay byte-identical
  * and the tracked spans must equal what [[JsoniqRun.Store.shredCandidates]]
  * + splitTopLevelArray compute from the finished JSON. */
class XmlEncodeSpansSpec extends SparkSpec {

  test("spans agree with the candidate scan + split (mixed content)") {
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1" // shredCandidates reads the prop
    try testBody()
    finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  private def testBody(): Unit = {
    val xml = "<site><regions><a/><b/></regions><people>" +
      (1 to 20).map(i =>
        s"""<person id="p$i">t$i<name>n$i</name> tail</person>""").mkString +
      "</people>mixed text<extra>" +
      (1 to 17).map(i => s"<e>x$i</e>").mkString + "</extra></site>"
    val (json, spans) = XmlItem.xmlToJsonSpans(xml, 1)
    // tracked and untracked encodes are byte-identical
    assert(json == XmlItem.xmlToJson(xml))
    val cands = JsoniqRun.Store.shredCandidates(json)
      .filter(c => c.kind == "xml" && c.count >= 16)
    assert(cands.nonEmpty)
    val bySteps = spans.map(s => s.steps -> s).toMap
    cands.foreach { c =>
      val sp = bySteps(c.steps)
      assert((sp.start, sp.end, sp.count) == (c.start, c.end, c.count),
        s"${c.steps}: (${sp.start},${sp.end},${sp.count}) vs " +
          s"(${c.start},${c.end},${c.count})")
      val oldMembers = JsoniqRun.Store
        .splitTopLevelArray(json.substring(c.start, c.end))
      val newMembers = sp.members.map(p =>
        json.substring((p >>> 32).toInt, (p & 0xFFFFFFFFL).toInt))
      assert(newMembers.toSeq == oldMembers.toSeq,
        s"members differ:\n${newMembers.take(3)}\n${oldMembers.take(3)}")
    }
  }

  test("namespaced attributes sharing a local name dedup (last wins)") {
    // a:x and b:x share local name 'x': duplicate JSON keys would make
    // the stored document unreadable (parse_json rejects them) — the
    // stream encode must keep the tree encode's ObjectNode.put
    // semantics: first occurrence's position, last value
    val xml = """<r xmlns:a="urn:a" xmlns:b="urn:b">""" +
      """<e a:x="1" y="mid" b:x="2"/></r>"""
    val (json, _) = XmlItem.xmlToJsonSpans(xml, Int.MaxValue)
    assert(json == XmlItem.xmlToJson(xml))
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val attrs = n.get("~c").get(0).get("~c").get(0).get("~a")
    assert(attrs.size() == 2, attrs.toString)
    assert(attrs.get("x").asText() == "2")
    assert(attrs.get("y").asText() == "mid")
    // the stored form round-trips through the variant reader
    val st = new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("xml-attr-dedup").toString)
    st.storeXml("c", "d.xml", xml)
    assert(JsoniqRun.serialize(st,
      "jn:doc('c','d.xml')/r/e/@y") == "\"mid\"")
  }

  test("parallel encode is byte-identical with identical spans") {
    // force the parallel path onto a small doc (threshold prop), then
    // diff json + every qualifying span against the serial encode
    val prevMin = sys.props.get("graft.xml.parallelMin")
    sys.props("graft.xml.parallelMin") = "1"
    try {
      // dominant child list + attrs + mixed text + self-closing +
      // entities + whitespace members + a nested qualifying list
      val xml = "<site><meta k=\"v&amp;w\">head</meta><people>" +
        (1 to 300).map(i =>
          s"""<person id="p$i">lead$i<name>n&lt;$i</name>""" +
            s"<sub>${(1 to 18).map(j => s"<t>$j</t>").mkString}</sub>" +
            " tail </person>").mkString(" ") +
        "</people><after>x</after></site>"
      for (minBytes <- Seq(1, 64, 100000)) {
        val par = XmlItem.parallelXmlToJsonSpans(xml, minBytes)
        assert(par.nonEmpty, s"parallel path declined at minBytes=$minBytes")
        val (pj, ps) = par.get
        val (sj, ss, _) = XmlItem.xmlToJsonSpansSerial(xml, minBytes)
        assert(pj == sj, "json bytes differ")
        val norm = (s: Seq[XmlItem.ListSpan]) =>
          s.map(x => (x.steps, x.start, x.end, x.members.toList))
            .sortBy(t => (t._2, t._3))
        assert(norm(ps) == norm(ss), s"spans differ at minBytes=$minBytes")
      }
      // constructs the textual split cannot carry decline to serial
      assert(XmlItem.parallelXmlToJsonSpans(
        "<r><!-- c -->" + "<e>1</e>" * 300 + "</r>", 1).isEmpty)
      assert(XmlItem.parallelXmlToJsonSpans(
        "<r xmlns:a=\"urn:a\">" + "<a:e>1</a:e>" * 300 + "</r>", 1).isEmpty)
      assert(XmlItem.parallelXmlToJsonSpans(
        "<r>" + "<e>1</e>" * 300 + "<![CDATA[x]]></r>", 1).isEmpty)
      // prolog is fine
      assert(XmlItem.parallelXmlToJsonSpans(
        "<?xml version=\"1.0\"?><r>" + "<e>1</e>" * 300 + "</r>", 1).nonEmpty)
    } finally prevMin match {
      case Some(v) => sys.props("graft.xml.parallelMin") = v
      case None => sys.props.remove("graft.xml.parallelMin"); ()
    }
  }

  test("parallel-encoded store answers like a serial-encoded one") {
    val prevMin = sys.props.get("graft.xml.parallelMin")
    val prevShred = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    val xml = "<site><people>" +
      (1 to 400).map(i =>
        s"<person><name>p$i</name><age>${18 + i % 60}</age></person>")
        .mkString + "</people></site>"
    def restore(): Unit = {
      prevMin match {
        case Some(v) => sys.props("graft.xml.parallelMin") = v
        case None => sys.props.remove("graft.xml.parallelMin"); ()
      }
      prevShred match {
        case Some(v) => sys.props("graft.shred.min") = v
        case None => sys.props.remove("graft.shred.min"); ()
      }
    }
    try {
      val q = "count(jn:doc('c','a.xml')/site/people/person" +
        "[?xs:integer($$/age/text()) ge 60])"
      sys.props("graft.xml.parallelMin") = s"${Int.MaxValue}"
      val serial = new JsoniqRun.Store(spark,
        java.nio.file.Files.createTempDirectory("xml-par-s").toString)
      serial.storeXml("c", "a.xml", xml)
      val want = JsoniqRun.serialize(serial, q)
      sys.props("graft.xml.parallelMin") = "1"
      val par = new JsoniqRun.Store(spark,
        java.nio.file.Files.createTempDirectory("xml-par-p").toString)
      par.storeXml("c", "a.xml", xml)
      assert(par.shredEntries("c", "a.xml", None).exists(_.kind == "xml"))
      assert(JsoniqRun.serialize(par, q) === want)
    } finally restore()
  }

  test("escapes, CDATA, attributes and whitespace survive the stream encode") {
    val xml = "<r a=\"x&amp;y&quot;z\">  <c>a&lt;b</c><![CDATA[raw<>&]]>" +
      "<empty/> trailing </r>"
    val (json, _) = XmlItem.xmlToJsonSpans(xml, 1)
    assert(json == XmlItem.xmlToJson(xml))
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val r = n.get("~c").get(0)
    assert(r.get("~a").get("a").asText() == "x&y\"z")
    val kids = r.get("~c")
    assert(kids.get(0).asText() == "  ") // whitespace text node kept
    assert(kids.get(1).get("~c").get(0).asText() == "a<b")
    assert(kids.get(2).asText() == "raw<>&")
    assert(kids.get(3).get("~n").asText() == "empty")
    assert(kids.get(4).asText() == " trailing ")
  }
}
