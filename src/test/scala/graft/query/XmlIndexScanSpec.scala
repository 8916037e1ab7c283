package graft.query

import graft.SparkSpec

/** The textual `xml:` index family over stored XML resources
  * (reference function/xml/XMLFun.java:148-181): create/find/scan for
  * name/path/CAS indexes, xml:sort-by-doc-order, xml:diff and
  * xml:import. CAS scans compare TYPED (numeric keys numerically —
  * the j_scan_cas_typed discipline); shredded element chains serve
  * member-local anchored patterns DISTRIBUTED and must agree with the
  * driver walk verbatim. */
class XmlIndexScanSpec extends SparkSpec {

  private def mkStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("graft-xidx").toString)

  private def run(st: JsoniqRun.Store, q: String): String =
    JsoniqRun.serialize(st, q)

  private val ages = Seq(30, 9, 2, 100, 10, 47)
  private val doc = "<site><people>" +
    ages.zipWithIndex.map { case (a, i) =>
      s"""<person id="p$i"><name>n$i</name><age>$a</age></person>"""
    }.mkString + "</people></site>"

  private def stored(): JsoniqRun.Store = {
    val st = mkStore()
    run(st, s"xml:store('col','d.xml','${doc.replace("'", "''")}')")
    st
  }

  test("CAS create + numeric point scan (typed comparison)") {
    val st = stored()
    run(st,
      """let $doc := xml:doc('col','d.xml')
        |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
        |return xml:commit($doc)""".stripMargin)
    // "9" > "10" lexicographically — numeric typing discriminates
    assert(run(st,
      """xml:scan-cas-index(xml:doc('col','d.xml'), 0, 9, '>', ())""")
      === "\"30\" \"100\" \"10\" \"47\"")
    // the reference signature's include-self form parses too
    assert(run(st,
      """xml:scan-cas-index(xml:doc('col','d.xml'), 0, 9, true(), '>', ())""")
      === "\"30\" \"100\" \"10\" \"47\"")
    // sdb:find-cas-index resolves the handle (QueryUsage.java:376)
    assert(run(st,
      "sdb:find-cas-index(xml:doc('col','d.xml'), 'xs:integer', " +
        "'/site/people/person/age')") === "0")
  }

  test("unanchored // patterns and attribute CAS scans") {
    val st = stored()
    run(st,
      """let $doc := xml:doc('col','d.xml')
        |let $a := xml:create-cas-index($doc, 'xs:integer', '//person/age')
        |let $b := xml:create-cas-index($doc, 'xs:string', '//@*')
        |return xml:commit($doc)""".stripMargin)
    assert(run(st,
      """xml:scan-cas-index(xml:doc('col','d.xml'), 0, 10, '<=', '//person/age')""")
      === "\"9\" \"2\" \"10\"")
    assert(run(st,
      """xml:scan-cas-index(xml:doc('col','d.xml'), 1, 'p2', '==', '//@*')""")
      === "\"p2\"")
  }

  test("CAS range scan") {
    val st = stored()
    run(st,
      """let $doc := xml:doc('col','d.xml')
        |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
        |return xml:commit($doc)""".stripMargin)
    assert(run(st,
      """xml:scan-cas-index-range(xml:doc('col','d.xml'), 0, 9, 47, true(), false(), ())""")
      === "\"30\" \"9\" \"10\"")
  }

  test("path scan returns elements, name scan returns named elements") {
    val st = stored()
    run(st,
      """let $doc := xml:doc('col','d.xml')
        |let $p := xml:create-path-index($doc, '/site/people/person')
        |let $n := xml:create-name-index($doc, fn:QName((), 'name'))
        |return xml:commit($doc)""".stripMargin)
    assert(run(st,
      "count(xml:scan-path-index(xml:doc('col','d.xml'), 0, " +
        "'/site/people/person'))") === "6")
    // hits are ELEMENT nodes (engine-canonical item JSON at top level;
    // xml:serialize renders them as XML text)
    assert(run(st,
      "xml:scan-path-index(xml:doc('col','d.xml'), 0, " +
        "'/site/people/person/name')")
      .startsWith("""{"~a":{},"~c":["n0"],"~n":"name"}"""))
    assert(run(st,
      "for $n in xml:scan-path-index(xml:doc('col','d.xml'), 0, " +
        "'/site/people/person/name') return xml:serialize($n)")
      .startsWith("\"<name>n0</name>\""))
    assert(run(st,
      "count(xml:scan-name-index(xml:doc('col','d.xml'), 1, " +
        "fn:QName((), 'name')))") === "6")
    // sort-by-doc-order is the identity over the engine's ordered hits
    assert(run(st,
      "count(xml:sort-by-doc-order(xml:scan-path-index(" +
        "xml:doc('col','d.xml'), 0, '/site/people/person')))") === "6")
  }

  test("a stale handle raises SIRIXDBF0002") {
    val st = stored()
    run(st,
      """let $doc := xml:doc('col','d.xml')
        |let $s := xml:create-cas-index($doc, 'xs:integer', '//person/age')
        |return xml:commit($doc)""".stripMargin)
    val e = intercept[IllegalArgumentException](run(st,
      """xml:scan-cas-index(xml:doc('col','d.xml'), 7, 9, '>', ())"""))
    assert(e.getMessage.contains("SIRIXDBF0002"))
  }

  test("shredded element chains serve member-local scans distributed") {
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val many = "<site><people>" +
        (0 until 40).map(i =>
          s"""<person id="p$i"><name>n$i</name><age>${i % 60}</age></person>"""
        ).mkString + "</people></site>"
      val st = mkStore()
      st.storeXml("col", "big.xml", many)
      assert(st.shredEntries("col", "big.xml", None).exists(_.kind == "xml"))
      run(st,
        """let $doc := xml:doc('col','big.xml')
          |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
          |return xml:commit($doc)""".stripMargin)
      val distributed = run(st,
        """xml:scan-cas-index(xml:doc('col','big.xml'), 0, 37, '>', ())""")
      assert(distributed === (38 until 40).map(i => s""""${i % 60}"""")
        .mkString(" "))
      // the driver walk (an unshredded store of the SAME document)
      // must agree verbatim
      prev match {
        case Some(v) => sys.props("graft.shred.min") = v
        case None => sys.props.remove("graft.shred.min"); ()
      }
      val plain = mkStore()
      plain.storeXml("col", "big.xml", many)
      assert(plain.shredEntries("col", "big.xml", None).isEmpty)
      run(plain,
        """let $doc := xml:doc('col','big.xml')
          |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
          |return xml:commit($doc)""".stripMargin)
      assert(distributed === run(plain,
        """xml:scan-cas-index(xml:doc('col','big.xml'), 0, 37, '>', ())"""))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("the typed CAS prefilter never drops multi-text or unparseable members") {
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      // member 17: TWO age elements (concat "41 43" types null — both
      // text nodes must still hit); member 18: unparseable age; the
      // rest numeric singles the prefilter CAN skip
      val tricky = "<site><people>" +
        (0 until 17).map(i =>
          s"<person><age>${i % 60}</age></person>").mkString +
        "<person><age>41</age><age>43</age></person>" +
        "<person><age>n/a</age></person>" +
        (19 until 24).map(i =>
          s"<person><age>${i + 20}</age></person>").mkString +
        "</people></site>"
      val st = mkStore()
      st.storeXml("col", "tr.xml", tricky)
      assert(st.shredEntries("col", "tr.xml", None).exists(_.kind == "xml"))
      run(st,
        """let $doc := xml:doc('col','tr.xml')
          |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
          |return xml:commit($doc)""".stripMargin)
      val got = run(st,
        """xml:scan-cas-index(xml:doc('col','tr.xml'), 0, 40, '>', ())""")
      // hits: the two multi-text ages 41 and 43 (their member's typed
      // concat "41 43" is null — the prefilter must keep it), then the
      // tail members' 41,42,43 (39 and 40 are not > 40)
      assert(got === Seq("41", "43", "41", "42", "43")
        .map(s => s""""$s"""").mkString(" "))
      // and the driver walk agrees verbatim
      val plain = {
        val p = sys.props.remove("graft.shred.min")
        val s2 = mkStore()
        s2.storeXml("col", "tr.xml", tricky)
        sys.props("graft.shred.min") = "1"
        s2
      }
      run(plain,
        """let $doc := xml:doc('col','tr.xml')
          |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
          |return xml:commit($doc)""".stripMargin)
      assert(got === run(plain,
        """xml:scan-cas-index(xml:doc('col','tr.xml'), 0, 40, '>', ())"""))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("xml:diff emits the update script between two revisions") {
    val st = mkStore()
    run(st, "xml:store('col','v.xml','<log><m id=\"1\">hi</m><m id=\"2\">yo</m></log>')")
    run(st, "xml:store('col','v.xml','<log><m id=\"1\">hi there</m><m id=\"3\">new</m><m id=\"2\">yo</m></log>')")
    val script = run(st, "xml:diff('col','v.xml', 1, 2)")
    assert(script.contains("let $doc := xml:doc('col','v.xml',1)"))
    assert(script.contains("insert nodes"))
    assert(script.contains("replace value of node") ||
      script.contains("rename node") || script.contains("delete node"))
    // identical revisions diff to the empty script
    run(st, "sdb:commit(xml:doc('col','v.xml'))")
    assert(run(st, "xml:diff('col','v.xml', 2, 3)") === "\"\"")
  }

  test("xml:import commits the imported document as a new revision") {
    val st = mkStore()
    run(st, "xml:store('col','i.xml','<log><m id=\"1\">hi</m></log>')")
    val f = java.nio.file.Files.createTempFile("graft-import", ".xml")
    java.nio.file.Files.write(f,
      "<log><m id=\"1\">hi</m><m id=\"2\">new entry</m></log>"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val imported = run(st,
      s"xml:import('col','i.xml','${f.toString}')")
    assert(imported.contains("new entry"))
    assert(graft.sources.TemporalTable.mostRecentRevision(
      st.docPath("col", "i.xml")).contains(2))
    assert(run(st, "xml:serialize(xml:doc('col','i.xml'))") ===
      "\"<log><m id=\\\"1\\\">hi</m><m id=\\\"2\\\">new entry</m></log>\"")
  }

  test("nested shredded chains emit each hit exactly once") {
    // r15: [site] and [site,people] BOTH shred; the outer entry's
    // member_raw contains the inner entry's subtrees — a pattern
    // member-local to both must serve from the DEEPEST entry only
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val nested = "<site>" +
        (0 until 16).map(i => s"<meta>m$i</meta>").mkString +
        "<people>" +
        (0 until 20).map(i =>
          s"<person><name>n$i</name><age>${i * 3}</age></person>")
          .mkString + "</people></site>"
      val st = mkStore()
      st.storeXml("col", "nest.xml", nested)
      val chains = st.shredEntries("col", "nest.xml", None)
        .filter(_.kind == "xml").map(_.steps)
      assert(chains.contains(List("site")) &&
        chains.contains(List("site", "people")),
        s"need nested xml entries, got $chains")
      run(st,
        """let $doc := xml:doc('col','nest.xml')
          |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
          |return xml:commit($doc)""".stripMargin)
      // 18 hits (ages 3*i > 3 → i in 2..19), each ONCE
      val got = run(st,
        """xml:scan-cas-index(xml:doc('col','nest.xml'), 0, 3, '>', ())""")
      assert(got === (2 until 20).map(i => s""""${i * 3}"""").mkString(" "))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("inner descendant gaps in index patterns (driver + distributed)") {
    // r15 (VERDICT Missing #4): brackit's Path dialect accepts interior
    // descendant steps — `/site//age` must match at any depth
    val deep = "<site><people>" +
      (0 until 6).map(i =>
        s"<person><info><age>${i * 10}</age></info></person>").mkString +
      "</people><stats><age>999</age></stats></site>"
    val st = mkStore()
    run(st, s"xml:store('col','g.xml','$deep')")
    run(st,
      """let $doc := xml:doc('col','g.xml')
        |let $s := xml:create-cas-index($doc, 'xs:integer', '/site//age')
        |return xml:commit($doc)""".stripMargin)
    assert(run(st,
      """xml:scan-cas-index(xml:doc('col','g.xml'), 0, 15, '>', ())""")
      === "\"20\" \"30\" \"40\" \"50\" \"999\"")
    // gap strictly inside the member suffix serves DISTRIBUTED
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val many = "<site><people>" +
        (0 until 40).map(i =>
          s"<person><info><age>${i % 60}</age></info></person>").mkString +
        "</people></site>"
      val st2 = mkStore()
      st2.storeXml("col", "g2.xml", many)
      assert(st2.shredEntries("col", "g2.xml", None).exists(_.kind == "xml"))
      run(st2,
        """let $doc := xml:doc('col','g2.xml')
          |let $s := xml:create-cas-index($doc, 'xs:integer', '/site/people/person//age')
          |return xml:commit($doc)""".stripMargin)
      assert(XmlScan.memberLocal(
        XmlScan.parse("/site/people/person//age"), List("site", "people")))
      assert(run(st2,
        """xml:scan-cas-index(xml:doc('col','g2.xml'), 0, 37, '>', ())""")
        === (38 until 40).map(i => s""""${i % 60}"""").mkString(" "))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("xml:diff escapes markup in values and quotes in string literals") {
    val st = mkStore()
    run(st, "xml:store('col','esc.xml','<log><m>plain</m></log>')")
    // new revision: text with <, &, and a double quote; an attribute
    // carrying a quote — the emitted script must stay well-formed
    val v2 = """<log><m>a &lt;b&gt; &amp; "q"</m><n t="x&quot;y">t2</n></log>"""
    run(st, s"xml:store('col','esc.xml','${v2.replace("'", "''")}')")
    // the diff result is ONE string item; decode the JSON serialization
    // to assert on the actual script text
    val script = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(run(st, "xml:diff('col','esc.xml', 1, 2)"), classOf[String])
    // string literals: quotes DOUBLE and & renders as &amp; (an entity
    // lead-in inside XQuery string literals); raw < is legal there.
    // XML content (insert nodes): text escapes <>&, attributes escape "
    assert(script.contains("\"\"q\"\""),
      s"quote doubling missing in: $script")
    assert(script.contains("&amp;"), s"raw & in script: $script")
    assert(!script.contains("& \"q\""),
      s"unescaped & before quote in: $script")
    assert(script.contains("&quot;") || script.contains("\"\""),
      s"attribute quote escaping missing in: $script")
  }
}
