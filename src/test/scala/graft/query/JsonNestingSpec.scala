package graft.query

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** Differential replay of the reference's nested-navigation corpus
  * (JsonIntegrationTest.java testNesting9-32): each test `jn:load`s the
  * test's own fixture (src/test/resources/json/testNestingNN/), runs the
  * reference's open query VERBATIM, and compares against the
  * reference's own expectedOutput file. Index-DDL prologue queries
  * (jn:create-*-index + sdb:commit) run too — index lookups are
  * pushdown in this engine, so they are handle-returning no-ops; the
  * pinned ANSWERS are what the replay checks. */
class JsonNestingSpec extends SparkSpec {

  private val Res =
    "/root/reference/bundles/sirix-query/src/test/resources/json"

  private def replay(testDir: String, openQuery: String,
                     indexQuery: Option[String] = None,
                     fixture: String = "multiple-revisions.json"): Unit = {
    if (!Files.isDirectory(Paths.get(s"$Res/$testDir")))
      cancel(s"reference corpus dir $testDir not present")
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-jnest").toString)
    val uri = Paths.get(s"$Res/$testDir/$fixture").toUri.toString
    JsoniqRun.serialize(st,
      s"jn:load('json-path1','mydoc.jn','$uri')")
    indexQuery.foreach(JsoniqRun.serialize(st, _))
    // node keys mask to 0 on BOTH sides (the reference's own
    // testIgnoreNodeKeys compare — its pins are stale pre-fusion
    // integers; a no-op for outputs without them)
    val got = normalizeMasked(JsoniqRun.serialize(st, openQuery))
    val want = normalizeMasked(new String(Files.readAllBytes(
      Paths.get(s"$Res/$testDir/expectedOutput")), "UTF-8"))
    assert(got == want, s"\n$testDir\ngot:  $got\nwant: $want")
  }

  test("nesting8: quoted deref + escaped-slash index path") {
    replay("testNesting8",
      """let $result := jn:doc('json-path1','mydoc.jn').paths."/consolidated_screening_list/search".get.parameters[3].name return { "result": $result }""",
      indexQuery = Some(
        """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, '/paths/\/consolidated_screening_list\/search/get/parameters/[]/name') return {"revision": sdb:commit($doc)}"""),
      fixture = "trade-apis.json")
  }

  test("nesting9/10: literal index chains into a loaded document") {
    replay("testNesting9",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[1].revision.tada[0].foo return { "result": $result }""")
    replay("testNesting10",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[1].revision.tada[0] return { "result": $result }""")
  }

  test("nesting11/12: deep index + double unbox deref") {
    replay("testNesting11",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[4] return { "result": $result }""")
    replay("testNesting12",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[][].foo return $result""")
  }

  test("nesting13: existential general comparison in a predicate") {
    replay("testNesting13",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[?$$[][].foo[].baz = 'bar'] return $result""")
  }

  test("nesting14/15/16: mixed unbox and index steps") {
    replay("testNesting14",
      """jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[4][].foo[1].baz""")
    replay("testNesting15",
      """jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[4][0].foo[1].baz""")
    replay("testNesting16",
      """let $baz := jn:doc('json-path1','mydoc.jn') let $return := $baz.sirix[2].revision.tada[4][0].foo[1].baz return $return""")
  }

  test("nesting21: range predicate over descendant leaves") {
    replay("testNesting21",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[?$$[][].foo[].baz >= 'baa' and $$[][].foo[].baz <= 'brr'] return $result""",
      indexQuery = Some(
        """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-cas-index($doc, 'xs:string', '/sirix/[]/revision/tada//[]/foo/[]/baz') return {"revision": sdb:commit($doc)}"""))
  }

  test("nesting22/23: name-index DDL is transparent to the answer") {
    replay("testNesting22",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[].revision.foo return $result""",
      indexQuery = Some(
        """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-name-index($doc, 'foo') return {"revision": sdb:commit($doc)}"""))
    // testNesting23 pins the SAME expected output through a different
    // (revision) name index
    replay("testNesting23",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[].revision.foo return $result""",
      indexQuery = Some(
        """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-name-index($doc, 'revision') return {"revision": sdb:commit($doc)}"""))
  }

  test("nesting24: starts-with predicate over unboxed leaves") {
    replay("testNesting24",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[][].foo[].baz[?starts-with($$, 'ba')] return $result""")
  }

  test("nesting25/26/27/28: unbox chains with and without index DDL") {
    replay("testNesting25",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[][].foo[] return $result""",
      indexQuery = Some(
        """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, '/sirix/[]/revision/tada//[]/foo/[]') return {"revision": sdb:commit($doc)}"""))
    replay("testNesting26",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[][].foo[] return $result""")
    replay("testNesting27",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[][].foo[][] return $result""")
    replay("testNesting28",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[][].foo[].baz[] return $result""")
  }

  test("nesting29/32: nested-index predicates on object members") {
    replay("testNesting29",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision[?$$.tada[][].foo[1].baz = 'bar'] return $result""")
    replay("testNesting32",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[4][?$$[].foo[1].baz = 'bar'] return $result""")
  }

  test("nesting30: negative index counts from the end") {
    replay("testNesting30",
      """let $result := jn:doc('json-path1','mydoc.jn').sirix[2].revision.tada[-1] return { "result": $result }""")
  }

  test("nesting31: scan-path-index returns path-matched nodes in order") {
    replay("testNesting31",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $pathIndexNumber := jn:find-path-index($doc, '/sirix/[]/revision/tada/[]')
        |return jn:scan-path-index($doc, $pathIndexNumber, '/sirix/[]/revision/tada/[]')""".stripMargin,
      indexQuery = Some(
        """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, '/sirix/[]/revision/tada/[]') return {"revision": sdb:commit($doc)}"""))
  }

  /** Normalize with nodeKey masking (the scan tests' testIgnoreNodeKeys). */
  private def normalizeMasked(pinned: String): String = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}
    import com.fasterxml.jackson.databind.node.ObjectNode
    val mapper = new ObjectMapper()
    mapper.configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    def mask(n: JsonNode): Unit = {
      if (n.isObject) {
        val o = n.asInstanceOf[ObjectNode]
        Seq("nodekey", "nodeKey").foreach(k => if (o.has(k)) { o.put(k, 0L); () })
        val it = o.elements(); while (it.hasNext) mask(it.next())
      } else if (n.isArray) {
        val it = n.elements(); while (it.hasNext) mask(it.next())
      }
    }
    val parser = mapper.createParser(pinned)
    val out = Seq.newBuilder[String]
    while (parser.nextToken() != null) {
      val n = mapper.readTree[JsonNode](parser)
      mask(n)
      out += mapper.writeValueAsString(mapper.treeToValue(n, classOf[Object]))
    }
    out.result().mkString(" ")
  }

  private def replayMasked(testDir: String, openQuery: String,
                           indexQuery: String, fixture: String): Unit = {
    if (!Files.isDirectory(Paths.get(s"$Res/$testDir")))
      cancel(s"reference corpus dir $testDir not present")
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-jnest").toString)
    val uri = Paths.get(s"$Res/$testDir/$fixture").toUri.toString
    JsoniqRun.serialize(st, s"jn:load('json-path1','mydoc.jn','$uri')")
    JsoniqRun.serialize(st, indexQuery)
    val got = normalizeMasked(JsoniqRun.serialize(st, openQuery))
    val want = normalizeMasked(new String(Files.readAllBytes(
      Paths.get(s"$Res/$testDir/expectedOutput")), "UTF-8"))
    assert(got == want, s"\n$testDir\ngot:  $got\nwant: $want")
  }

  test("scan-path-index with sdb:path (testCreateAndScanPathIndex)") {
    replayMasked("testCreateAndScanPathIndex",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $pathIndexNumber := jn:find-path-index($doc, '/sirix/[]/revision/tada//[]/foo')
        |for $node in jn:scan-path-index($doc, $pathIndexNumber, '/sirix/[]/revision/tada//[]/foo')
        |order by sdb:revision($node), sdb:nodekey($node)
        |return {"nodeKey": sdb:nodekey($node), "path": sdb:path($node)}""".stripMargin,
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $stats := jn:create-path-index($doc, '/sirix/[]/revision/tada//[]/foo')
        |return {"revision": sdb:commit($doc)}""".stripMargin,
      "multiple-revisions.json")
  }

  test("scan-cas-index-range over the decimal index (testCreateAndScanCASIndex)") {
    // the range scan's $paths is () — coverage comes from the CAS
    // index DEFINITION registered by the DDL (the reference scans the
    // index itself); 2.33 is excluded (include-low false), strings and
    // booleans are not in a decimal index
    replayMasked("testCreateAndScanCASIndex",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $casIndexNumber := jn:find-cas-index($doc, 'xs:decimal', '/sirix/[]/revision/foo/[]')
        |for $node in jn:scan-cas-index-range($doc, $casIndexNumber, 2.33, 100, false(), true(), ())
        |order by sdb:revision($node), sdb:nodekey($node)
        |return {"nodeKey": sdb:nodekey($node), "node": $node}""".stripMargin,
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $stats := jn:create-cas-index($doc,'xs:decimal','/sirix/[]/revision/foo/[]')
        |return {"revision": sdb:commit($doc)}""".stripMargin,
      "multiple-revisions.json")
  }

  test("scan-cas-index with self-or-parent path (testCreateAndScanCASIndex2/3)") {
    val conditional =
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $casIndexNumber := jn:find-cas-index($doc, 'xs:string', '//*')
        |for $node in jn:scan-cas-index($doc, $casIndexNumber, 'bar', '==', ())
        |order by sdb:revision($node), sdb:nodekey($node)
        |let $self := sdb:path($node)
        |let $path := if (exists($self)) then $self else sdb:path(sdb:select-parent($node))
        |return {"nodeKey": sdb:nodekey($node), "node": $node, "path": $path}""".stripMargin
    replayMasked("testCreateAndScanCASIndex2", conditional,
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $stats := jn:create-cas-index($doc,'xs:string',('//*','//[]'))
        |return {"revision": sdb:commit($doc)}""".stripMargin,
      "multiple-revisions.json")
    replayMasked("testCreateAndScanCASIndex3",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $casIndexNumber := jn:find-cas-index($doc, 'xs:string', '//@context')
        |for $node in jn:scan-cas-index($doc, $casIndexNumber, 'http://iiif.io/api/search/0/context.json', '==', ())
        |order by sdb:revision($node), sdb:nodekey($node)
        |let $self := sdb:path($node)
        |let $path := if (exists($self)) then $self else sdb:path(sdb:select-parent($node))
        |return {"nodeKey": sdb:nodekey($node), "node": $node, "path": $path}""".stripMargin,
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $stats := jn:create-cas-index($doc,'xs:string',('//*','//[]'))
        |return {"revision": sdb:commit($doc)}""".stripMargin,
      "copperfield-book.json")
  }

  test("nesting4: predicate scan over the twitter fixture") {
    replay("testNesting4",
      """for $i in jn:doc('json-path1','mydoc.jn').statuses[].user.entities.url[?$$.urls[].url eq 'https://t.co/TcEE6NS8nD'] order by sdb:nodekey($i) return {"result": $i, "nodekey": sdb:nodekey($i) }""",
      fixture = "../twitter.json")
  }

  test("nesting5: quoted-field deref into the trade-apis fixture") {
    replay("testNesting5",
      """let $result := jn:doc('json-path1','mydoc.jn').paths."/consolidated_screening_list/search".get.parameters return { "result": $result, "nodekey": sdb:nodekey($result) }""",
      fixture = "trade-apis.json")
  }

  test("nesting6/17/18: nested FLWOR with eq filter over parameters") {
    val q =
      """for $i in jn:doc('json-path1','mydoc.jn').paths."/consolidated_screening_list/search".get
        |let $j := $i.parameters[].name
        |return for $k in $j
        |       where $k eq 'keyword'
        |       return { "result": $i, "nodekey": sdb:nodekey($i) }""".stripMargin
    replay("testNesting6", q, fixture = "trade-apis.json")
    replay("testNesting17", q, fixture = "trade-apis.json")
    replay("testNesting18", q, fixture = "trade-apis.json")
  }

  test("nesting7: existential predicate on quoted-field get") {
    replay("testNesting7",
      """let $result := jn:doc('json-path1','mydoc.jn').paths."/consolidated_screening_list/search".get[?$$.parameters[].name = 'keyword'] return { "result": $result, "nodekey": sdb:nodekey($result) }""",
      fixture = "trade-apis.json")
  }

  test("nesting19/20: two-level let chains over quoted-field derefs") {
    val q =
      """for $i in jn:doc('json-path1','mydoc.jn').paths."/consolidated_screening_list/search"
        |let $j := $i.get
        |let $l := $j.parameters[].name
        |return for $k in $l
        |       where $k eq 'keyword'
        |       return { "result": $i, "nodekey": sdb:nodekey($i) }""".stripMargin
    replay("testNesting19", q, fixture = "trade-apis.json")
    replay("testNesting20", q, fixture = "trade-apis.json")
  }

  test("json path matcher: segments, gaps, wildcards, escapes") {
    import JsonPath._
    assert(parsePattern("/sirix/[]/revision") ==
      List(Name("sirix"), AnyMember, Name("revision")))
    assert(parsePattern("//[]") == List(Desc, AnyMember))
    assert(parsePattern("/a/\\/b\\/c/d") ==
      List(Name("a"), Name("/b/c"), Name("d")))
    assert(matches(List("sirix", "[]", "revision"),
      parsePattern("/sirix/[]/revision")))
    assert(matches(List("a", "b", "c"), parsePattern("//c")))
    assert(!matches(List("a", "b", "c"), parsePattern("/a/c")))
    assert(matches(List("a", "[]", "x", "[]", "baz"),
      parsePattern("/a//[]/baz")))
    assert(matches(List("a", "b"), parsePattern("/a/*")))
    assert(!matches(List("a", "[]"), parsePattern("/a/*")))
    val hits = walkMatches("""{"a":[{"b":1},{"b":2}],"c":{"b":3}}""", Some("//b"))
    assert(hits.map(_.json) == Seq("1", "2", "3"), hits)
    assert(hits.map(_.path) == Seq("/a/[0]/b", "/a/[1]/b", "/c/b"), hits)
    assert(hits.head.parentPath == "/a/[0]")
    // the array node owns the [] class and prints a [] step of its own
    val arr = walkMatches("""{"a":[1,2]}""", Some("/a/[]"))
    assert(arr.map(_.json) == Seq("[1,2]") && arr.head.path == "/a/[]", arr)
    val cas = walkMatches("""{"a":[1,2]}""", Some("/a/[]"), Some(_ == "2"))
    // member hits carry no SELF path (select-parent territory), only the
    // parent array's
    assert(cas.map(h => (h.json, h.path, h.parentPath)) ==
      Seq(("2", "", "/a/[]")), cas)
  }

  test("scan-name-index (testCreateAndScanNameIndex — paths own-concrete)") {
    // The reference's pinned output shows same-name key nodes SHARING a
    // path-summary entry — e.g. two hits printed
    // '/sirix/[0]/revision/tada/[0]/foo' while '/sirix/[0]/revision/foo'
    // never prints at all — a node-store artifact with no value-model
    // analog. This replay pins the semantic content of the same query
    // run VERBATIM: the same 7 hits, every hit at revision 2 (the index
    // creation's sdb:commit), each with its OWN concrete path.
    val dir = "testCreateAndScanNameIndex"
    if (!Files.isDirectory(Paths.get(s"$Res/$dir")))
      cancel(s"reference corpus dir $dir not present")
    val st = new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-jnest").toString)
    val uri = Paths.get(s"$Res/$dir/multiple-revisions.json").toUri.toString
    JsoniqRun.serialize(st, s"jn:load('json-path1','mydoc.jn','$uri')")
    JsoniqRun.serialize(st,
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-name-index($doc, ('foo','bar')) return {"revision": sdb:commit($doc)}""")
    val got = JsoniqRun.serialize(st,
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $nameIndexNumber := jn:find-name-index($doc, 'foo')
        |for $node in jn:scan-name-index($doc, $nameIndexNumber, 'foo')
        |order by sdb:revision($node), sdb:nodekey($node)
        |return {"nodeKey": sdb:nodekey($node), "path": sdb:path($node), "revision": sdb:revision($node)}""".stripMargin)
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val parser = mapper.createParser(got)
    val rows = Iterator.continually(parser.nextToken())
      .takeWhile(_ != null)
      .map(_ => mapper.readTree[com.fasterxml.jackson.databind.JsonNode](parser))
      .toSeq
    assert(rows.size == 7, got)
    assert(rows.forall(_.get("revision").asInt == 2), got)
    assert(rows.map(_.get("path").asText).sorted == Seq(
      "/sirix/[0]/revision/foo", "/sirix/[0]/revision/tada/[0]/foo",
      "/sirix/[1]/revision/foo", "/sirix/[1]/revision/tada/[0]/foo",
      "/sirix/[2]/revision/foo", "/sirix/[2]/revision/tada/[0]/foo",
      "/sirix/[2]/revision/tada/[4]/[0]/foo"), got)
    // a name filter of every key (empty sequence): every object key in
    // the document (34 in this fixture, independently counted)
    assert(JsoniqRun.serialize(st,
      """count(jn:scan-name-index(jn:doc('json-path1','mydoc.jn'), 0, ()))""")
      == "34")
  }
}
