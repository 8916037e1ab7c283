package graft.queries

import graft.query.JsoniqRun
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential oracle rows for the JSONiq front end: each row stores a
  * document from the reference's own integration corpus
  * (bundles/sirix-query/src/test/java/io/sirix/query/
  * JsonIntegrationTest.java), runs the reference's query text VERBATIM
  * through [[graft.query.JsoniqRun]], and returns the computed sequence
  * serialization as one row. The DuckDB oracle is the reference's PINNED
  * assertion as a literal — the row is green only when the engine
  * computes the reference's answer from the input (pinned strings carry
  * one documented canonicalisation: sorted object keys; `sdb:nodekey`
  * values are REAL fused-preorder keys since round 13 — pins follow
  * the reference's own fused-mode expectations).
  * JsoniqSpec replays the wider corpus (26 queries); these rows put a
  * representative of each operator class under the driver's oracle gate. */
object JsoniqQueries {

  private def runOne(s: SparkSession, setup: Seq[String],
                     query: String): DataFrame = {
    val st = new JsoniqRun.Store(s,
      java.nio.file.Files.createTempDirectory("graft-jq-oracle").toString)
    setup.foreach(JsoniqRun.serialize(st, _))
    val out = JsoniqRun.serialize(st, query)
    s.range(1).select(lit(out).as("result"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deref over a parenthesized FLWOR pipeline (JsonIntegrationTest:42)
    "j_deref_pipeline" -> { (s, _) =>
      runOne(s, Nil,
        """count((for $i in 1 to 3 return {"a": $i}).a)""")
    },
    // descendant deref =>> with child + descendant matches (ibid:75)
    "j_descendant_deref" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('json-path1','mydoc.jn','[{"test": "test string"},{"test": [{"blabla": "test blabla string"}]}]')"""),
        """let $array := jn:doc('json-path1','mydoc.jn')
          |return $array=>>test""".stripMargin)
    },
    // =>> recursion into matched values (ibid:225, the nastiest pin)
    "j_descendant_recurse" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('json-path1','mydoc.jn','[{"test": "test string"},{"test": [{"test": "test string"},{"test": {"test": {"test": "test string"}}}]}]')"""),
        """let $array := jn:doc('json-path1','mydoc.jn')
          |return $array=>>test""".stripMargin)
    },
    // FLWOR + deep-equal + object-merge construction (ibid:639)
    "j_flwor_filter" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('json-path1','mydoc.jn','[{"generic": 1, "location": {"city": "Los Angeles", "state": "CA"}}, {"generic": 1, "location": {"city": "New York", "state": "NY"}}]')"""),
        """for $i in jn:doc('json-path1','mydoc.jn') where deep-equal($i.generic, 1) return {$i,'nodeKey': sdb:nodekey($i)}""")
    },
    // node identity end-to-end: real fused-preorder node keys
    // (sdb/trx/GetNodeKey.java over [[graft.query.NodeKeys]]), by-key
    // selection (jn/trx/SelectJsonItem.java), the structural counts
    // (GetChildCount/GetDescendantCount), BFS level-order (LevelOrder
    // .java), and key STABILITY across an update-derived revision (the
    // edit-log replay: same-kind replace keeps keys, appends mint fresh)
    "j_node_identity" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('json-path1','mydoc.jn','[{"name":"Laptop","price":999},{"name":"Mouse","price":19}]')""",
          """replace json value of jn:doc('json-path1','mydoc.jn')[0].price with 899""",
          """append json {"name":"Dock","price":129} into jn:doc('json-path1','mydoc.jn')"""),
        """[
          |  (for $i in jn:doc('json-path1','mydoc.jn')[] return sdb:nodekey($i)),
          |  sdb:nodekey(jn:doc('json-path1','mydoc.jn')[0].price),
          |  jn:select-json-item(jn:doc('json-path1','mydoc.jn'), 5),
          |  sdb:child-count(jn:doc('json-path1','mydoc.jn')),
          |  sdb:descendant-count(jn:doc('json-path1','mydoc.jn')),
          |  count(sdb:level-order(jn:doc('json-path1','mydoc.jn'), 1))
          |]""".stripMargin)
    },
    // textual xml: family (function/xml/XMLFun.java): store → doc →
    // serialize roundtrip, XPath-lite navigation, attribute count
    "j_xml_textual" -> { (s, _) =>
      runOne(s,
        Seq("""xml:store('col','doc.xml','<a b="1" e="2"><c>x</c><d/></a>')"""),
        """[
          |  xml:serialize(xml:doc('col','doc.xml')),
          |  xml:doc('col','doc.xml')/a/c/text(),
          |  xml:attribute-count(xml:doc('col','doc.xml')/a),
          |  sdb:descendant-count(xml:doc('col','doc.xml')/a)
          |]""".stripMargin)
    },
    // textual xml: INDEX family (function/xml/XMLFun.java:148-181):
    // CAS create + TYPED numeric point scan (the j_scan_cas_typed
    // discipline — "9" > "10" lexicographically, so the first entry is
    // EMPTY under string comparison), attribute CAS, range scan, path
    // scan, name scan + per-hit serialization
    "j_xml_index" -> { (s, _) =>
      runOne(s,
        Seq("""xml:store('col','d.xml','<site><people><person id="p0"><name>n0</name><age>30</age></person><person id="p1"><name>n1</name><age>9</age></person><person id="p2"><name>n2</name><age>2</age></person><person id="p3"><name>n3</name><age>100</age></person></people></site>')""",
          """let $doc := xml:doc('col','d.xml')
            |let $a := xml:create-cas-index($doc, 'xs:integer', '/site/people/person/age')
            |let $b := xml:create-cas-index($doc, 'xs:string', '//@*')
            |let $p := xml:create-path-index($doc, '/site/people/person')
            |let $n := xml:create-name-index($doc, fn:QName((), 'name'))
            |return xml:commit($doc)""".stripMargin),
        """[
          |  xml:scan-cas-index(xml:doc('col','d.xml'), 0, 9, '>', ()),
          |  xml:scan-cas-index(xml:doc('col','d.xml'), 1, 'p2', '==', '//@*'),
          |  xml:scan-cas-index-range(xml:doc('col','d.xml'), 0, 9, 100, true(), false(), ()),
          |  count(xml:scan-path-index(xml:doc('col','d.xml'), 2, '/site/people/person')),
          |  (for $h in xml:scan-name-index(xml:doc('col','d.xml'), 3, fn:QName((), 'name'))
          |   return xml:serialize($h)),
          |  sdb:find-cas-index(xml:doc('col','d.xml'), 'xs:integer', '/site/people/person/age'),
          |  xml:scan-cas-index(xml:doc('col','d.xml'), 0, 9, '>', '/site//age')
          |]""".stripMargin)
    },
    // xml:diff (function/xml/diff/Diff.java — the FMSE-matched update
    // script) and xml:import (function/xml/io/Import.java — commit an
    // imported document as the next revision)
    "j_xml_import_diff" -> { (s, _) =>
      val st = new JsoniqRun.Store(s,
        java.nio.file.Files.createTempDirectory("graft-jq-oracle").toString)
      JsoniqRun.serialize(st,
        """xml:store('col','v.xml','<log><m id="1">hi</m><m id="2">yo</m></log>')""")
      JsoniqRun.serialize(st,
        """xml:store('col','v.xml','<log><m id="1">hi there</m><m id="2">yo</m></log>')""")
      val f = java.nio.file.Files.createTempFile("graft-import", ".xml")
      java.nio.file.Files.write(f,
        """<log><m id="1">hi there</m><m id="2">yo</m><m id="3">new</m></log>"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val out = JsoniqRun.serialize(st,
        s"""[
           |  xml:diff('col','v.xml', 1, 2),
           |  xml:serialize(xml:import('col','v.xml','${f.toString}')),
           |  sdb:most-recent-revision(xml:doc('col','v.xml'))
           |]""".stripMargin)
      s.range(1).select(org.apache.spark.sql.functions.lit(out)
        .as("result"))
    },
    // sdb:explain (function/sdb/explain/Explain.java): compiles the
    // argument query and returns the plan WITHOUT executing. Pinned
    // STRUCTURALLY: the typed shred filter must reach the parquet scan
    // (PushedFilters + a pruned typed-struct ReadSchema) — a pushdown
    // regression flips the booleans, independent of timing
    "j_explain" -> { (s, _) =>
      val prev = sys.props.get("graft.shred.min")
      sys.props("graft.shred.min") = "1"
      try {
        val st = new JsoniqRun.Store(s,
          java.nio.file.Files.createTempDirectory("graft-jq-oracle").toString)
        st.store("c", "x.jn", (1 to 40).map(i =>
          s"""{"v": $i, "w": ${i % 10}}""").mkString("[", ",", "]"))
        require(st.isShredded("c", "x.jn"), "j_explain: doc must shred")
        val out = JsoniqRun.serialize(st,
          """[
            |  contains(sdb:explain('count(jn:doc("c","x.jn")[][?$$.w gt 5])'),
            |           "PushedFilters: [IsNotNull(t.w)]"),
            |  contains(sdb:explain('count(jn:doc("c","x.jn")[][?$$.w gt 5])'),
            |           "ReadSchema: struct<t:struct<w:bigint>>")
            |]""".stripMargin)
        s.range(1).select(org.apache.spark.sql.functions.lit(out)
          .as("result"))
      } finally prev match {
        case Some(v) => sys.props("graft.shred.min") = v
        case None => sys.props.remove("graft.shred.min"); ()
      }
    },
    // nested unboxing + context-item predicate + value comparison (ibid:872)
    "j_nesting_pred" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('json-path1','mydoc.jn','[{"key":0},{"value":[{"key":{"boolean":5}},{"newkey":"yes"}]},{"key":"hey","value":false}]')"""),
        """for $i in jn:doc('json-path1','mydoc.jn')[1].value[].key[?$$.boolean gt 3] return { $i, "nodekey": sdb:nodekey($i) }""")
    },
    // array slice (ibid:519)
    "j_array_slice" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('json-path1','mydoc.jn','[{"generic": 1, "location": {"city": "Los Angeles", "state": "CA"}},{"generic": 2, "location": {"city": "New York", "state": "NY"}},{"generic": 3, "location": {"city": "Montgomery", "state": "AL"}}]')"""),
        """let $doc := jn:doc('json-path1','mydoc.jn')
          |return $doc[0:1]""".stripMargin)
    },
    // FLWOR order by over computed keys + aggregate
    "j_order_agg" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','o.jn','[{"n": 2},{"n": 9},{"n": 4}]')"""),
        """for $i in jn:doc('c','o.jn') order by $i.n descending return $i.n""")
    },
    // temporal axis: re-store commits revisions, jn:all-times iterates them
    "j_time_travel" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','doc.jn','{"v": 1}')""",
          """jn:store('c','doc.jn','{"v": 2}')"""),
        """for $d in jn:all-times(jn:doc('c','doc.jn')) return $d.v""")
    },
    // JSON update statements: each applied update commits a revision, so
    // the final state AND the time-travel reads are both pinned
    // (JsonIntegrationTest:654-718's update surface + the revision axis)
    "j_update" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','u.jn','["foo",true,false,null]')""",
          """insert json (1, 2, 3) into jn:doc('c','u.jn') at position 3""",
          """delete json jn:doc('c','u.jn')[1]""",
          """replace json value of jn:doc('c','u.jn')[0] with "yes""""),
        """(jn:doc('c','u.jn'), jn:doc('c','u.jn', 1), count(jn:all-times(jn:doc('c','u.jn'))))""")
    },
    // textual revision axes (reference function/jn/JNFun.java:99-105):
    // jn:past / jn:first / jn:last slices of the revision history, plus
    // jn:future with includeSelf — four commits, content pinned per axis
    "j_past" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','ax.jn','{"v": 1}')""",
          """jn:store('c','ax.jn','{"v": 2}')""",
          """jn:store('c','ax.jn','{"v": 3}')""",
          """jn:store('c','ax.jn','{"v": 4}')"""),
        """((for $d in jn:past(jn:doc('c','ax.jn', 3)) return $d.v),
          |(for $d in jn:future(jn:doc('c','ax.jn', 2), true) return $d.v),
          |jn:first(jn:doc('c','ax.jn')).v,
          |jn:last(jn:doc('c','ax.jn')).v)""".stripMargin)
    },
    // XQuery F&O stdlib mix (reference gets these from brackit; the
    // semantics are pinned by its JsonQueryCorrectnessSweepTest —
    // substring clamping, codepoint lengths, tokenize trailing empties,
    // 1-based index-of, subsequence∘reverse, insert-before clamping,
    // round-half-to-even ties, distinct-values first-occurrence order)
    "j_fn_stdlib" -> { (s, _) =>
      runOne(s, Nil,
        """(substring("metadata", 0, 3),
          |string-length("metadata"),
          |count(tokenize("a/b//c/", "/")),
          |index-of(("a","b","c","b","a"), "b"),
          |reverse(subsequence(("a","b","c","d","e"), 2, 3)),
          |insert-before((9, 8, 7), 0, 99),
          |round(2.5), round-half-to-even(2.5), round-half-to-even(3.5),
          |floor(-2.5), ceiling(-2.5), round(-2.5),
          |distinct-values(("x","y","x","z","y","x")),
          |string-join(("a","b","c"), "-"),
          |matches("abc123", "[0-9]+$"),
          |concat("A", 2),
          |abs(-3.5),
          |substring-before("a=b", "="), substring-after("a=b", "="),
          |upper-case("ab"), contains("hello", ""),
          |starts-with("", "x"))""".stripMargin)
    },
    // JSONiq object/array builtins (brackit JSONFun; the reference's
    // ArrayCountToSizeStage rewrites count(E[]) to jn:size(E) — both
    // forms answer identically here)
    "j_jn_builtins" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','b.jn','{"a":[1,2,3,4],"o":{"x":1,"b":{"y":2},"c":"s"}}')"""),
        """(jn:size(jn:doc('c','b.jn').a),
          |count(jn:doc('c','b.jn').a[]),
          |jn:members(jn:doc('c','b.jn').a),
          |jn:keys(jn:doc('c','b.jn').o),
          |jn:values(jn:doc('c','b.jn').o))""".stripMargin)
    },
    // jn:open-revisions over the full time window: one item per
    // committed revision (reference function/jn/io/OpenRevisions.java)
    "j_open_revisions" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','w.jn','{"v": 1}')""",
          """jn:store('c','w.jn','{"v": 2}')""",
          """jn:store('c','w.jn','{"v": 3}')"""),
        """for $d in jn:open-revisions('c','w.jn',
          |  "1970-01-01T00:00:00Z", "2100-01-01T00:00:00Z")
          |return $d.v""".stripMargin)
    },
    // jn:diff update script between two revisions (reference
    // function/jn/diff/Diff.java:71): insert/replace/delete ops
    "j_diff" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','df.jn','{"a": 1, "b": {"x": true}, "c": [1, 2]}')""",
          """jn:store('c','df.jn','{"a": 2, "b": {"y": false}, "c": [1, 5]}')"""),
        """jn:diff('c','df.jn', 1, 2)""")
    },
    // bitemporal valid-axis stab from query text (reference
    // function/jn/temporal/ValidAt.java:45): closed intervals,
    // open-ended bounds, and unregistered records
    "j_valid_at" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('bt','emp.jn','[{"name":"Alice","validFrom":"2020-01-01T00:00:00Z","validTo":"2020-12-31T23:59:59Z"},{"name":"Bob","validFrom":"2020-06-01T00:00:00Z"},{"name":"Charlie","validFrom":"2019-01-01T00:00:00Z","validTo":"2019-12-31T23:59:59Z"},{"name":"Dave"}]')"""),
        """((for $r in jn:valid-at('bt','emp.jn', xs:dateTime('2020-07-01T12:00:00Z')) return $r.name),
          |(for $r in jn:valid-at('bt','emp.jn', xs:dateTime('2019-12-31T23:59:59Z')) return $r.name))""".stripMargin)
    },
    // both axes (reference function/jn/temporal/OpenBitemporal.java:53):
    // transaction-time as-of read, then the valid-axis stab
    "j_bitemporal" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('bt','h.jn','[{"name":"Alice","validFrom":"2020-01-01T00:00:00Z","validTo":"2020-12-31T00:00:00Z"}]')""",
          """jn:store('bt','h.jn','[{"name":"Alice","validFrom":"2020-01-01T00:00:00Z","validTo":"2020-12-31T00:00:00Z"},{"name":"Eve","validFrom":"2019-01-01T00:00:00Z","validTo":"2021-12-31T00:00:00Z"}]')"""),
        """((for $r in jn:open-bitemporal('bt','h.jn', xs:dateTime('2100-01-01T00:00:00Z'), xs:dateTime('2020-07-01T00:00:00Z')) return $r.name),
          |(for $r in jn:open-bitemporal('bt','h.jn', xs:dateTime('2100-01-01T00:00:00Z'), xs:dateTime('2019-06-01T00:00:00Z')) return $r.name),
          |count(sdb:item-history(jn:doc('bt','h.jn'))))""".stripMargin)
    },
    // textual FLWOR group-by compiled onto ONE hash aggregate over the
    // tuple stream (reference differential family:
    // scan/TypedGroupByDifferentialTest.java:188-223): typed keys,
    // missing-vs-null as DISTINCT buckets, numeric provenance merging
    // (1 and 1.0 are one group), regrouped variables as sequences
    // (count/sum over $u), plus the XQuery `count` clause ordinal
    "j_groupby" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','g.jn','[{"d":"a","v":1},{"d":"b","v":2},{"d":"a","v":3},{"v":4},{"d":null,"v":5},{"d":"b","v":2}]')"""),
        """((for $u in jn:doc('c','g.jn')[] let $d := $u.d group by $d
          |return {"d": $d, "n": count($u), "s": sum($u.v)}),
          |(for $i in (1, 2, 1.0, 3) group by $i count $c return [$i, $c]))""".stripMargin)
    },
    // remaining revision axes (reference jn/temporal/Next.java,
    // FirstExisting.java, LastExisting.java): next-revision content via
    // the all-times stash, first/last existing revision of a node
    "j_first_existing" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','nx.jn','{"v": 1}')""",
          """jn:store('c','nx.jn','{"v": 2, "w": 9}')""",
          """jn:store('c','nx.jn','{"v": 3, "w": 9}')"""),
        """((for $n in jn:all-times(jn:doc('c','nx.jn'))
          |  where exists(jn:next($n)) return jn:next($n).v),
          |jn:first-existing(jn:doc('c','nx.jn')).v,
          |jn:last-existing(jn:doc('c','nx.jn')).v,
          |(for $n in jn:first-existing(jn:doc('c','nx.jn').w)
          |  return sdb:revision($n)))""".stripMargin)
    },
    // CAS range scan (reference jn/index/scan/ScanCASIndexRange.java):
    // $paths = () resolves the registered index DEFINITION's paths;
    // 2.33 excluded (include-low false), non-decimal values not indexed
    "j_scan_range" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','r.jn','{"foo": ["bar", null, 2.33, 23.76, 100, 100.5], "baz": 7}')""",
          """let $doc := jn:doc('c','r.jn')
            |let $stats := jn:create-cas-index($doc,'xs:decimal','/foo/[]')
            |return {"revision": sdb:commit($doc)}""".stripMargin),
        """let $doc := jn:doc('c','r.jn')
          |let $idx := jn:find-cas-index($doc, 'xs:decimal', '/foo/[]')
          |return ($idx, jn:scan-cas-index-range($doc, $idx, 2.33, 100, false(), true(), ()))""".stripMargin)
    },
    // CAS POINT scan with a numeric key (reference
    // index/cas/CASFilter.java:24-47 compares typed Atomics): 9 < 10
    // NUMERICALLY where "9" > "10" lexicographically — the pin is empty
    // under string comparison, so it discriminates the two semantics;
    // $paths = () resolves the registered definition like j_scan_range
    "j_scan_cas_typed" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','pt.jn','{"m": [{"w": 10}, {"w": 9}, {"w": 2}, {"w": 100}]}')""",
          """let $doc := jn:doc('c','pt.jn')
            |let $stats := jn:create-cas-index($doc,'xs:decimal','/m/[]/w')
            |return {"revision": sdb:commit($doc)}""".stripMargin),
        """let $doc := jn:doc('c','pt.jn')
          |let $idx := jn:find-cas-index($doc, 'xs:decimal', '/m/[]/w')
          |return (jn:scan-cas-index($doc, $idx, 9, '>', ()),
          |        jn:scan-cas-index($doc, $idx, 9.0, '<=', '/m/[]/w'))""".stripMargin)
    },
    // the DISTRIBUTED scan path under the gate: a >4MB root-array doc
    // (default shred threshold fires — required loudly), then all
    // three scan families serve from skeleton + member tables
    // (jn/index/scan/ScanPathIndex.java:35 streams from indexes; here
    // hits never materialize on the driver)
    "j_scan_shredded" -> { (s, _) =>
      val st = new JsoniqRun.Store(s,
        java.nio.file.Files.createTempDirectory("graft-jq-oracle").toString)
      val doc = (1 to 120000).map(i =>
          s"""{"v": $i, "pad": "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"}""")
        .mkString("[", ",", "]")
      st.store("c", "sc.jn", doc)
      require(st.isShredded("c", "sc.jn"),
        "j_scan_shredded: the document must shred (threshold regression?)")
      val out = JsoniqRun.serialize(st,
        """(count(jn:scan-cas-index-range(jn:doc('c','sc.jn'), 0, 119990, 120000, true(), true(), '/[]/v')),
          |count(jn:scan-path-index(jn:doc('c','sc.jn'), 0, '/[]/v')),
          |count(jn:scan-name-index(jn:doc('c','sc.jn'), 0, 'pad')))""".stripMargin)
      s.range(1).select(lit(out).as("result"))
    },
    // resource-level valid-time configuration (reference
    // ResourceConfiguration.java:689 persists validFromPath/validToPath;
    // StoreValidTimeAutoIndexTest.java:96's jn:store options form):
    // jn:valid-at defaults to the configured fields and
    // jn:scan-valid-time-index requires them
    "j_valid_config" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','vt.jn','[{"id": 1, "from": "2024-01-01T00:00:00Z", "to": "2024-06-30T00:00:00Z"},{"id": 2, "from": "2024-07-01T00:00:00Z"},{"id": 3}]', true(), {"validFromPath": "from", "validToPath": "to"})"""),
        """((for $r in jn:valid-at('c','vt.jn', xs:dateTime('2024-03-01T00:00:00Z')) return $r.id),
          |(for $r in jn:scan-valid-time-index(jn:doc('c','vt.jn'), xs:dateTime('2024-08-01T00:00:00Z')) return $r.id))""".stripMargin)
    },
    // textual catalog ops + revision metadata (reference jn/io/
    // DropResource.java, ExistsDatabase.java — JNFun.java:258-264;
    // sdb/trx/GetRevisionTimestamp.java, GetAuthorName.java,
    // GetMostRecentRevision.java, IsDeleted.java): exists→drop→exists,
    // commit author/timestamp/head through query text
    "j_catalog" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('cat','m.jn','{"a": 1, "w": 5}')""",
          """jn:store('cat','m.jn','{"a": 2}')""",
          """jn:store('cat','tmp.jn','{"x": 1}')""",
          """jn:drop-resource('cat','tmp.jn')"""),
        """(jn:exists-database('cat'), jn:exists-database('nope'),
          |jn:exists-resource('cat','m.jn'),
          |jn:exists-resource('cat','tmp.jn'),
          |sdb:most-recent-revision(jn:doc('cat','m.jn')),
          |sdb:author-name(jn:doc('cat','m.jn')),
          |sdb:timestamp(jn:doc('cat','m.jn')) gt "2020",
          |sdb:is-deleted(jn:doc('cat','m.jn').w),
          |sdb:is-deleted(jn:doc('cat','m.jn').a))""".stripMargin)
    },
    // valid-time index DDL variant of j_valid_config (reference
    // jn/index/create/CreateValidTimeIndex.java — requires the
    // resource's valid-time config, idempotent on type; sdb:valid-from/
    // sdb:valid-to read the configured interval fields per item)
    "j_vt_ddl" -> { (s, _) =>
      runOne(s,
        Seq("""jn:store('c','vd.jn','[{"id": 1, "from": "2024-01-01T00:00:00Z", "to": "2024-06-30T00:00:00Z"},{"id": 2, "from": "2024-07-01T00:00:00Z"}]', true(), {"validFromPath": "from", "validToPath": "to"})""",
          """let $d := jn:doc('c','vd.jn')
            |let $i := jn:create-valid-time-index($d)
            |return {"idx": $i}""".stripMargin),
        """((for $r in jn:scan-valid-time-index(jn:doc('c','vd.jn'),
          |    xs:dateTime('2024-08-01T00:00:00Z')) return $r.id),
          |jn:create-valid-time-index(jn:doc('c','vd.jn')),
          |(for $r in jn:doc('c','vd.jn')
          | return (sdb:valid-from($r), sdb:valid-to($r))))""".stripMargin)
    },
    // XMark q01/q05 verbatim over the reference's auction.xml, pinned to
    // the reference's own results/qNN.out (XmarkSpec replays q06/q07 too)
    "j_xmark_q01" -> { (s, _) => runXmark(s, "q01") },
    "j_xmark_q02" -> { (s, _) => runXmark(s, "q02") },
    "j_xmark_q05" -> { (s, _) => runXmark(s, "q05") },
    // the formerly-slow correlated set: person/auction joins through the
    // static-hoist + in-row HOF compile path (round-10 decorrelation)
    "j_xmark_q08" -> { (s, _) => runXmark(s, "q08") },
    "j_xmark_q11" -> { (s, _) => runXmark(s, "q11") },
    "j_xmark_q12" -> { (s, _) => runXmark(s, "q12") },
    "j_xmark_q20" -> { (s, _) => runXmark(s, "q20") })

  private val XmarkDir =
    "/root/reference/bundles/sirix-query/src/test/resources/xmark"

  /** auction.xml converted once per JVM (driver-side 1.4 MB string). */
  private lazy val auctionJson: String =
    graft.query.XmlItem.xmlToJson(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$XmarkDir/auction.xml")), "UTF-8"))

  private def runXmark(s: SparkSession, name: String): DataFrame = {
    val st = new JsoniqRun.Store(s,
      java.nio.file.Files.createTempDirectory("graft-xmark-oracle").toString)
    val q = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$XmarkDir/queries/orig/$name.xq")), "UTF-8")
    s.range(1).select(lit(
      JsoniqRun.serialize(st, q, Some(auctionJson))).as("result"))
  }

  private def pin(s: String): String =
    "SELECT '" + s.replace("'", "''") + "' AS result"

  val oracles: Map[String, String] = Map(
    "j_deref_pipeline" -> pin("3"),
    "j_descendant_deref" ->
      pin("\"test string\" [{\"blabla\":\"test blabla string\"}]"),
    "j_descendant_recurse" -> pin(
      "\"test string\" [{\"test\":\"test string\"},{\"test\":{\"test\":{\"test\":\"test string\"}}}] " +
        "\"test string\" {\"test\":{\"test\":\"test string\"}} {\"test\":\"test string\"} \"test string\""),
    // real fused-preorder node keys since round 13 ([[graft.query
    // .NodeKeys]]; the reference's own fused-mode pins —
    // IndexVersioningIntegrationTest.java:92 pins 7 for this shape)
    "j_flwor_filter" -> pin(
      "{\"generic\":1,\"location\":{\"city\":\"Los Angeles\",\"state\":\"CA\"},\"nodeKey\":2} " +
        "{\"generic\":1,\"location\":{\"city\":\"New York\",\"state\":\"NY\"},\"nodeKey\":7}"),
    "j_nesting_pred" -> pin("{\"boolean\":5,\"nodekey\":7}"),
    // members 2/5/8 (8 minted by the append), price key 4 STABLE across
    // the same-kind replace, key 5 = the second object, counts 3/9,
    // 3 nodes at BFS depth 1
    "j_node_identity" -> pin(
      "[2,5,8,4,{\"name\":\"Mouse\",\"price\":19},3,9,3]"),
    "j_xml_textual" -> pin(
      "[\"<a b=\\\"1\\\" e=\\\"2\\\"><c>x</c><d/></a>\",\"x\",2,3]"),
    // scan > 9 numerically = 30,100 (EMPTY under string comparison);
    // range [9,100) excludes 2 and 100; path count 4; name hits
    // serialize per element; find resolves handle 0
    "j_explain" -> pin("[true,true]"),
    // trailing entry: an interior-descendant-gap pattern (/site//age —
    // brackit's Path dialect, r15) answering identically to the
    // anchored form over this corpus
    "j_xml_index" -> pin(
      "[\"30\",\"100\",\"p2\",\"30\",\"9\",4,\"<name>n0</name>\"," +
        "\"<name>n1</name>\",\"<name>n2</name>\",\"<name>n3</name>\",0," +
        "\"30\",\"100\"]"),
    // ONE replace-value op between the revisions (FMSE matches the
    // rest); the import commits revision 3 with the new entry
    "j_xml_import_diff" -> pin(
      "[\"let $doc := xml:doc('col','v.xml',1)\\nreturn (\\n  " +
        "replace value of node sdb:select-item($doc, 1048580) with " +
        "\\\"hi there\\\"\\n)\"," +
        "\"<log><m id=\\\"1\\\">hi there</m><m id=\\\"2\\\">yo</m>" +
        "<m id=\\\"3\\\">new</m></log>\",3]"),
    "j_array_slice" ->
      pin("[{\"generic\":1,\"location\":{\"city\":\"Los Angeles\",\"state\":\"CA\"}}]"),
    "j_order_agg" -> pin("9 4 2"),
    "j_time_travel" -> pin("1 2"),
    "j_update" -> pin(
      "[\"yes\",false,[1,2,3],null] [\"foo\",true,false,null] 4"),
    // jn:past iterates NEWEST-first (reference PastAxis.java:55-63
    // counts revision DOWN; r15 fixed the direction)
    "j_past" -> pin("2 1 2 3 4 1 4"),
    "j_fn_stdlib" -> pin("\"me\" 8 5 2 4 \"d\" \"c\" \"b\" 99 9 8 7 " +
      "3 2 4 -3 -2 -2 \"x\" \"y\" \"z\" \"a-b-c\" true \"A2\" 3.5 " +
      "\"a\" \"b\" \"AB\" true false"),
    // keys/values surface in INSERTION order (r16: sourced from the
    // items' original text — brackit JSONFun iterates members as
    // written; the fixture's keys are deliberately unsorted)
    "j_jn_builtins" -> pin("4 4 1 2 3 4 \"x\" \"b\" \"c\" 1 {\"y\":2} \"s\""),
    "j_open_revisions" -> pin("1 2 3"),
    "j_diff" -> pin(new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(
        """{"database":"c","resource":"df.jn","old-revision":1,""" +
          """"new-revision":2,"diffs":[""" +
          """{"op":"replace","path":"/a","value":2},""" +
          """{"op":"delete","path":"/b/x"},""" +
          """{"op":"insert","path":"/b/y","value":false},""" +
          """{"op":"replace","path":"/c/1","value":5}]}""")),
    "j_valid_at" -> pin("\"Alice\" \"Bob\" \"Charlie\""),
    "j_bitemporal" -> pin("\"Alice\" \"Eve\" \"Eve\" 2"),
    "j_groupby" -> pin(
      "{\"d\":\"a\",\"n\":2,\"s\":4} {\"d\":\"b\",\"n\":2,\"s\":4} " +
        "{\"d\":null,\"n\":1,\"s\":4} {\"d\":null,\"n\":1,\"s\":5} " +
        "[1,1] [2,2] [3,3]"),
    "j_first_existing" -> pin("2 3 1 3 2"),
    "j_scan_range" -> pin("0 23.76 100"),
    "j_scan_cas_typed" -> pin("10 100 9 2"),
    "j_scan_shredded" -> pin("11 120000 120000"),
    "j_valid_config" -> pin("1 2"),
    "j_catalog" -> pin("true false true false 2 \"graft\" true true false"),
    "j_vt_ddl" -> pin("2 0 \"2024-01-01T00:00:00Z\" " +
      "\"2024-06-30T00:00:00Z\" \"2024-07-01T00:00:00Z\""),
    "j_xmark_q01" -> pin("\"Sinisa Farrel\""),
    // 120 <increase> elements (incl. self-closed empties) from the
    // reference's own results/q02.out, re-serialized the way the front
    // end serializes string items: JSON-quoted, space-joined
    "j_xmark_q02" -> pin(xmarkElementsPin("q02")),
    "j_xmark_q05" -> pin("75"),
    "j_xmark_q08" -> pin(xmarkElementsPin("q08")),
    "j_xmark_q11" -> pin(xmarkElementsPin("q11")),
    "j_xmark_q12" -> pin(xmarkElementsPin("q12")),
    "j_xmark_q20" -> pin(xmarkElementsPin("q20")))

  /** The reference's pinned qNN.out (concatenated sibling elements) in
    * the front end's sequence serialization. */
  private def xmarkElementsPin(name: String): String = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$XmarkDir/results/$name.out")), "UTF-8").trim
    val out = Seq.newBuilder[String]
    var depth = 0
    var from = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i) == '<') {
        val close = raw(i + 1) == '/'
        val gt = raw.indexOf('>', i)
        val selfClosing = raw(gt - 1) == '/'
        if (close) depth -= 1 else if (!selfClosing) depth += 1
        i = gt + 1
        if (depth == 0) { out += raw.substring(from, i); from = i }
      } else i += 1
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    out.result().map(mapper.writeValueAsString).mkString(" ")
  }
}
