package graft.query

import graft.SparkSpec

import java.nio.file.Files

/** Differential replay of the reference's own JSONiq corpus
  * (bundles/sirix-query/src/test/java/io/sirix/query/
  * JsonIntegrationTest.java) through the [[JsoniqRun]] front end: each
  * test stores the reference's document, runs the reference's query
  * text VERBATIM, and compares against the reference's pinned assertion.
  *
  * Normalisation: object keys sort (the variant encoding serializes
  * canonically; the corpus' fixtures are key-sorted already except
  * where noted) on the pinned string. `sdb:nodekey` values compare
  * VERBATIM against exact-mode reference pins; replays of the
  * reference's own `testIgnoreNodeKeys` cases mask `nodekey`/`nodeKey`
  * to 0 on BOTH sides ([[checkIgnoreNodeKeys]]) — the reference masks
  * there because its pinned integers predate record fusion
  * (JsonIntegrationTest.java:32's own comment). */
class JsoniqSpec extends SparkSpec {

  private def freshStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-jq").toString)

  /** Canonical form of a reference-pinned sequence serialization
    * (whitespace-separated JSON items): sorted keys, optional
    * nodekey masking. */
  private def normalize(pinned: String, maskKeys: Boolean): String = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}
    import com.fasterxml.jackson.databind.node.ObjectNode
    val mapper = new ObjectMapper()
    mapper.configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    def mask(n: JsonNode): Unit = {
      if (n.isObject) {
        val o = n.asInstanceOf[ObjectNode]
        Seq("nodekey", "nodeKey").foreach { k =>
          if (o.has(k)) { o.put(k, 0L); () }
        }
        val it = o.elements(); while (it.hasNext) mask(it.next())
      } else if (n.isArray) {
        val it = n.elements(); while (it.hasNext) mask(it.next())
      }
    }
    // readTree on a shared parser, NOT MappingIterator: the latter
    // streams a top-level array's ELEMENTS instead of the array value
    val parser = mapper.createParser(pinned)
    val out = Seq.newBuilder[String]
    while (parser.nextToken() != null) {
      val n = mapper.readTree[JsonNode](parser)
      if (maskKeys) mask(n)
      out += mapper.writeValueAsString(mapper.treeToValue(n, classOf[Object]))
    }
    out.result().mkString(" ")
  }

  private def check(setup: Seq[String], query: String, pinned: String): Unit = {
    val st = freshStore()
    setup.foreach(JsoniqRun.serialize(st, _))
    val got = JsoniqRun.serialize(st, query)
    val want = normalize(pinned, maskKeys = false)
    assert(got == want, s"\nquery: $query\ngot:   $got\nwant:  $want")
  }

  /** Replay of a reference `testIgnoreNodeKeys` case: nodekeys mask to
    * 0 on BOTH sides (the reference's pins are stale pre-fusion
    * integers there; this engine's are fused-preorder). */
  private def checkIgnoreNodeKeys(setup: Seq[String], query: String,
                                  pinned: String): Unit = {
    val st = freshStore()
    setup.foreach(JsoniqRun.serialize(st, _))
    val got = normalize(JsoniqRun.serialize(st, query), maskKeys = true)
    val want = normalize(pinned, maskKeys = true)
    assert(got == want, s"\nquery: $query\ngot:   $got\nwant:  $want")
  }

  // ---- dereference over pipelines (JsonIntegrationTest.java:42-73) ----

  test("j: deref over parenthesized pipeline") {
    check(Nil, """count((for $i in 1 to 3 return {"a": $i}).a)""", "3")
  }

  test("j: deref skips records without the field") {
    check(Nil,
      """count((for $i in 1 to 3 return if ($i eq 2) then {"b": $i} else {"a": $i}).a)""",
      "2")
  }

  test("j: deref sequence iterates freshly per pass") {
    check(Nil,
      """let $s := (for $i in 1 to 3 return {"a": $i}).a
        |return count($s) + count($s)""".stripMargin, "6")
  }

  // ---- descendant deref (JsonIntegrationTest.java:75-353) ----

  private val D1 =
    """jn:store('json-path1','mydoc.jn','[{"test": "test string"},{"test": [{"blabla": "test blabla string"}]}]')"""

  test("j: descendant deref, child match") {
    check(Seq(D1),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      "\"test string\" [{\"blabla\":\"test blabla string\"}]")
  }

  test("j: descendant deref after unbox") {
    check(Seq(D1),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array[]=>>test""".stripMargin,
      "\"test string\" [{\"blabla\":\"test blabla string\"}]")
  }

  test("j: descendant deref on an object root") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"test": "test string"}')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      "\"test string\"")
  }

  test("j: descendant deref, descendant match") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"foo": "test string"},{"foo": [{"test": "test blabla string"}]}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      "\"test blabla string\"")
  }

  test("j: descendant deref through a nested array") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"bla": ["test string",{"test": "test blabla string"}]}')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      "\"test blabla string\"")
  }

  test("j: descendant deref after deref chain") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"foo": "test string"},{"foo": [{"test": "foo"}, [{"test": "test blabla string"}]]}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array[].foo=>>test""".stripMargin,
      "\"foo\" \"test blabla string\"")
  }

  test("j: descendant deref, different paths on same level") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"tada": {"baz": [{"test": "test string"}],"foo": [{"test": "test blabla string"}]}}')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      "\"test string\" \"test blabla string\"")
  }

  test("j: descendant deref, different paths on same level in array") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"baz": [{"test": "test string"}]},{"foo": [{"test": "test blabla string"}]}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      "\"test string\" \"test blabla string\"")
  }

  test("j: descendant deref recurses into matched values") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"test": "test string"},{"test": [{"test": "test string"},{"test": "test string"}]}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      """"test string" [{"test":"test string"},{"test":"test string"}] "test string" "test string"""")
  }

  test("j: descendant deref recurses deeply into matched values") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"test": "test string"},{"test": [{"test": "test string"},{"test": {"test": {"test": "test string"}}}]}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test""".stripMargin,
      """"test string" [{"test":"test string"},{"test":{"test":{"test":"test string"}}}] "test string" {"test":{"test":"test string"}} {"test":"test string"} "test string"""")
  }

  test("j: descendant deref skips empty containers") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[[],[{"test": true}],{"test": "test string"},{"test": [{"test": "test string"},{"test": {"test": {"test": "test string"}}}]},{}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array[]=>>test""".stripMargin,
      """true "test string" [{"test":"test string"},{"test":{"test":{"test":"test string"}}}] "test string" {"test":{"test":"test string"}} {"test":"test string"} "test string"""")
  }

  test("j: descendant deref chained with unbox and deref") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[[],[{"test": true}],{"test": "test string"},{"test": [{"test": "test string"},{"test": {"test": {"test": "test string"}}}]},{}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test[].test""".stripMargin,
      """"test string" {"test":{"test":"test string"}}""")
  }

  test("j: double descendant deref") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"test": "test string"},{"test": [[[{"blabla": "test blabla string"}]],{"blabla": "test blabla string"},[{"blabla": "test blabla string"}]]}]')"""),
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return $array=>>test=>>blabla""".stripMargin,
      "\"test blabla string\" \"test blabla string\" \"test blabla string\"")
  }

  test("j: deref chain into descendant deref") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','{"tztz": [[],[{"test": true}],{"test": "test string"},{"test": [{"test": "test string"},{"test": {"test": {"test": "test string"}}}]},{}]}')"""),
      """let $object := jn:doc('json-path1','mydoc.jn')
        |return $object.tztz[].test=>>test""".stripMargin,
      """"test string" {"test":{"test":"test string"}} {"test":"test string"} "test string"""")
  }

  // ---- FLWOR over documents (JsonIntegrationTest.java:391-858) ----

  test("j: simple FLWOR with xs:string and contains") {
    check(Seq("""jn:store('json-path1','mydoc.jn','[{"test": "test string"}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn')
        |let $value := xs:string($i.test)
        |where contains($value, 'test')
        |return $i""".stripMargin,
      """{"test":"test string"}""")
  }

  test("j: deep-equal filter with object-merge construction") {
    checkIgnoreNodeKeys(Seq(
      """jn:store('json-path1','mydoc.jn','[{"generic": 1, "location": {"city": "Los Angeles", "state": "CA"}}, {"generic": 1, "location": {"city": "New York", "state": "NY"}}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn') where deep-equal($i.generic, 1) return {$i,'nodeKey': sdb:nodekey($i)}""",
      """{"generic":1,"location":{"city":"Los Angeles","state":"CA"},"nodeKey":2} {"generic":1,"location":{"city":"New York","state":"NY"},"nodeKey":11}""")
  }

  test("j: array iteration with key filter") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0,"value":true},{"key":"hey","value":false}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn') where deep-equal($i.key, 0) return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"key":0,"nodekey":2,"value":true}""")
  }

  test("j: instance-of filter over unboxed values") {
    checkIgnoreNodeKeys(Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0},{"value":{"key":true}},{"key":"hey","value":false}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[].value where $i instance of object() and $i.key eq true() return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"key":true,"nodekey":7}""")
  }

  test("j: context-item predicate over nested unboxing") {
    checkIgnoreNodeKeys(Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0},{"value":[{"key":{"boolean":true}},{"newkey":"yes"}]},{"key":"hey","value":false}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[].value[].key[?$$.boolean] return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"boolean":true,"nodekey":10}""")
  }

  test("j: array index and context predicate with comparison") {
    checkIgnoreNodeKeys(Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0},{"value":[{"key":{"boolean":5}},{"newkey":"yes"}]},{"key":"hey","value":false}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[1].value[].key[?$$.boolean gt 3] return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"boolean":5,"nodekey":10}""")
  }

  test("j: array slice") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"generic": 1, "location": {"city": "Los Angeles", "state": "CA"}},
        |{"generic": 2, "location": {"city": "New York", "state": "NY"}},
        |{"generic": 3, "location": {"city": "Montgomery", "state": "AL"}}]')""".stripMargin),
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |return $doc[0:1]""".stripMargin,
      """[{"generic":1,"location":{"city":"Los Angeles","state":"CA"}}]""")
  }

  // ---- JSON update statements (JsonIntegrationTest.java:536-840) ----

  test("j: replace json value in an array") {
    check(Seq("""jn:store('json-path1','mydoc.jn','["foo",true,false,null]')""",
      """replace json value of jn:doc('json-path1','mydoc.jn')[1] with "yes""""),
      "jn:doc('json-path1','mydoc.jn')",
      "[\"foo\",\"yes\",false,null]")
  }

  test("j: delete json from an array") {
    check(Seq("""jn:store('json-path1','mydoc.jn','["foo",true,false,null]')""",
      """delete json jn:doc('json-path1','mydoc.jn')[1]"""),
      "jn:doc('json-path1','mydoc.jn')",
      "[\"foo\",false,null]")
  }

  test("j: append json into an array (a sequence brackets to an array)") {
    check(Seq("""jn:store('json-path1','mydoc.jn','["foo",true,false,null]')""",
      """append json (1, 2, 3) into jn:doc('json-path1','mydoc.jn')"""),
      "jn:doc('json-path1','mydoc.jn')",
      "[\"foo\",true,false,null,[1,2,3]]")
  }

  test("j: append json object with jn:null into an empty array") {
    check(Seq("""jn:store('json-path1','mydoc.jn','[]')""",
      """append json {"generic": 1, "foo": jn:null()} into jn:doc('json-path1','mydoc.jn')"""),
      "jn:doc('json-path1','mydoc.jn')",
      "[{\"generic\":1,\"foo\":null}]")
  }

  test("j: append json deep literal structure") {
    check(Seq("""jn:store('json-path1','mydoc.jn','[]')""",
      """append json {"generic": 1, "location": {"state": "NY", "ddd": {"sssss": []}, "city": "New York", "foobar": [[],{"bar": true()},[],{}]},"foo":jn:null()} into jn:doc('json-path1','mydoc.jn')"""),
      "jn:doc('json-path1','mydoc.jn')",
      """[{"generic":1,"location":{"state":"NY","ddd":{"sssss":[]},"city":"New York","foobar":[[],{"bar":true},[],{}]},"foo":null}]""")
  }

  test("j: insert json into an array at a position") {
    check(Seq("""jn:store('json-path1','mydoc.jn','["foo",true,false,null]')""",
      """insert json (1, 2, 3) into jn:doc('json-path1','mydoc.jn') at position 3"""),
      "jn:doc('json-path1','mydoc.jn')",
      "[\"foo\",true,false,[1,2,3],null]")
    check(Seq("""jn:store('json-path1','mydoc.jn','["foo",true,false,null]')""",
      """insert json { "name": "keyword" } into jn:doc('json-path1','mydoc.jn') at position 3"""),
      "jn:doc('json-path1','mydoc.jn')",
      "[\"foo\",true,false,{\"name\":\"keyword\"},null]")
  }

  test("j: insert json into an object merges fields") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"foo": "bar"}')""",
      """insert json {"baz": true()} into jn:doc('json-path1','mydoc.jn')"""),
      "jn:doc('json-path1','mydoc.jn')",
      "{\"foo\":\"bar\",\"baz\":true}")
  }

  test("j: delete json object field") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"foo": "bar", "baz": true}')""",
      """delete json jn:doc('json-path1','mydoc.jn').foo"""),
      "jn:doc('json-path1','mydoc.jn')",
      "{\"baz\":true}")
  }

  test("j: rename json object field") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"foo": "bar", "baz": true}')""",
      """rename json jn:doc('json-path1','mydoc.jn').foo as "buzz""""),
      "jn:doc('json-path1','mydoc.jn')",
      "{\"buzz\":\"bar\",\"baz\":true}")
  }

  test("j: replace json value of object field") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"foo": "bar", "baz": true}')""",
      """replace json value of jn:doc('json-path1','mydoc.jn').baz with "yes""""),
      "jn:doc('json-path1','mydoc.jn')",
      "{\"foo\":\"bar\",\"baz\":\"yes\"}")
  }

  test("j: runtime update target — delete a field of a filtered member") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"generic": 1, "location": {"city": "Los Angeles", "state": "CA"}}]')""",
      """for $i in jn:doc('json-path1','mydoc.jn') where deep-equal($i.generic, 1) return delete json $i.location"""),
      "jn:doc('json-path1','mydoc.jn')",
      """[{"generic":1}]""")
  }

  test("j: runtime update target — replace a filtered member's field") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"generic": 1, "location": {"city": "Los Angeles", "state": "CA"}}, {"generic": 2, "location": {"city": "New York", "state": "NY"}}]')""",
      """for $i in jn:doc('json-path1','mydoc.jn') where deep-equal($i.generic, 2) return replace json value of $i."generic" with 1"""),
      "jn:doc('json-path1','mydoc.jn')",
      """[{"generic":1,"location":{"city":"Los Angeles","state":"CA"}},{"generic":1,"location":{"city":"New York","state":"NY"}}]""")
  }

  test("j: runtime update target — positional delete via at \\$pos") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"generic": 1}, {"location": {"city": "Los Angeles", "state": "CA"}}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') for $i at $pos in $doc where deep-equal($i.generic, 1) return delete json $doc[$pos - 1]"""),
      "jn:doc('json-path1','mydoc.jn')",
      """[{"location":{"city":"Los Angeles","state":"CA"}}]""")
  }

  test("j: runtime update target — delete all, descending computed indices") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"generic": 1, "location": {"city": "Los Angeles", "state": "CA"}},
        |{"generic": 2, "location": {"city": "New York", "state": "NY"}},
        |{"generic": 3, "location": {"city": "Montgomery", "state": "AL"}}]')""".stripMargin,
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $m := for $i at $pos in $doc
        |          return $pos - 1
        |for $i in $m order by $i descending return delete json $doc[$i]""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      "[]")
  }

  test("j: runtime update target — ascending indices resolve against the pristine tree") {
    // No `order by ... descending` workaround: pointers [0] and [2] arrive
    // ascending, yet both must land on the members they resolved to BEFORE
    // any mutation (XQUF pending-update-list discipline) — naive sequential
    // application would delete member 0, shift, then miss member 2.
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"del": true, "v": "a"}, {"v": "b"}, {"del": true, "v": "c"}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |for $i at $pos in $doc where deep-equal($i.del, true())
        |return delete json $doc[$pos - 1]""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      """[{"v":"b"}]""")
  }

  test("j: reversed range is the empty sequence") {
    check(Nil, "count(5 to 1)", "0")
    check(Nil, "count(3 to 3)", "1")
  }

  test("j: malformed number is a lex error, not a late cast failure") {
    val st = freshStore()
    val e = intercept[IllegalArgumentException] {
      JsoniqRun.serialize(st, "1.2.3")
    }
    assert(e.getMessage.contains("unexpected '.'"))
  }

  test("j: multi-statement update against a let-bound static path") {
    check(Seq(
      """jn:store('json-path1','mydoc.jn','[{"bla":true},{"bar":"foobar"},{"bla":null,"foo":false,"baz":null}]')""",
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return (insert json {"tr": true, "baba": [true,false,null,"foo",{"foo":"bar"}]} into $array[2], delete json $array[1])""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      """[{"bla":true},{"bla":null,"foo":false,"baz":null,"tr":true,"baba":[true,false,null,"foo",{"foo":"bar"}]}]""")
  }

  test("j: a where-false FLWOR applies no update and commits nothing") {
    val st = freshStore()
    JsoniqRun.serialize(st, """jn:store('c','n.jn','[{"a": 1}]')""")
    JsoniqRun.serialize(st,
      """for $i in jn:doc('c','n.jn') where deep-equal($i.a, 99) return delete json $i.a""")
    assert(JsoniqRun.serialize(st, "jn:doc('c','n.jn')") == "[{\"a\":1}]")
    assert(JsoniqRun.serialize(st,
      "count(jn:all-times(jn:doc('c','n.jn')))") == "1",
      "an empty pending update list must not mint a revision")
  }

  test("j: replace and rename through an indexed let path") {
    check(Seq("""jn:store('json-path1','mydoc.jn','[{"test": "test string"}]')""",
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return replace json value of $array[0].test with "bar"""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      "[{\"test\":\"bar\"}]")
    check(Seq("""jn:store('json-path1','mydoc.jn','[{"test": "test string"}]')""",
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return rename json $array[0].test as "bar"""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      "[{\"bar\":\"test string\"}]")
  }

  test("j: six-update composition pins final state and head revision") {
    // JsonIntegrationTest.test() (line 719): the update sequence the
    // reference uses to pin revision numbering
    val st = freshStore()
    Seq(
      """jn:store('json-path1','mydoc.jn','[{"test": "test string"}]')""",
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return rename json $array[0].test as "bar"""".stripMargin,
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return replace json value of $array[0].bar with "foobar"""".stripMargin,
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return insert json {"bla":true} into $array at position 0""".stripMargin,
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return append json {"bla":null} into $array""".stripMargin,
      """let $array := jn:doc('json-path1','mydoc.jn')
        |return insert json {"foo": not(true), "baz": null} into $array[2]""".stripMargin
    ).foreach(JsoniqRun.serialize(st, _))
    assert(JsoniqRun.serialize(st, "jn:doc('json-path1','mydoc.jn')") ==
      normalize("""[{"bla":true},{"bar":"foobar"},{"bla":null,"foo":false,"baz":null}]""", maskKeys = false))
    assert(JsoniqRun.serialize(st,
      "sdb:revision(jn:doc('json-path1','mydoc.jn'))") == "6")
    // the reference's change-detection epilogue shape (JsonIntegration
    // Test.test():746-764): jn:all-times over a node, keeping revisions
    // whose content differs from the previous one (jn:previous /
    // sdb:hash), bracketed with revisions. The reference addresses the
    // node by nodeKey (identity); this value model addresses the SLOT
    // [0], which every revision populates: first {"test":..}, renamed,
    // replaced, then the position-0 insert swaps in {"bla":true} — four
    // distinct contents across six revisions.
    val got = JsoniqRun.serialize(st,
      """[
        |  for $node-in-rev in jn:all-times(jn:doc('json-path1','mydoc.jn')[0])
        |  where (not(exists(jn:previous($node-in-rev)))) or (sdb:hash($node-in-rev) ne sdb:hash(jn:previous($node-in-rev)))
        |  return { "node": $node-in-rev, "revision": sdb:revision($node-in-rev) }
        |]""".stripMargin)
    assert(got == normalize(
      """[{"node":{"test":"test string"},"revision":1},{"node":{"bar":"test string"},"revision":2},{"node":{"bar":"foobar"},"revision":3},{"node":{"bla":true},"revision":4}]""",
      maskKeys = false), got)
  }

  test("j: every applied update commits a revision (time travel over updates)") {
    val st = freshStore()
    JsoniqRun.serialize(st, """jn:store('c','u.jn','["a"]')""")
    JsoniqRun.serialize(st, """append json "b" into jn:doc('c','u.jn')""")
    JsoniqRun.serialize(st, """delete json jn:doc('c','u.jn')[0]""")
    assert(JsoniqRun.serialize(st, "jn:doc('c','u.jn')") == "[\"b\"]")
    assert(JsoniqRun.serialize(st, "jn:doc('c','u.jn', 1)") == "[\"a\"]")
    assert(JsoniqRun.serialize(st, "jn:doc('c','u.jn', 2)") == "[\"a\",\"b\"]")
    assert(JsoniqRun.serialize(st,
      "count(jn:all-times(jn:doc('c','u.jn')))") == "3")
  }

  // ---- multi-statement updates (JsonMultipleUpdatesTest.java) ----

  test("j: two replaces in one query (web-GUI pattern)") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"first": 1, "second": 2}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |return (
        |  replace json value of $doc.first with 10,
        |  replace json value of $doc.second with 20
        |)""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      """{"first":10,"second":20}""")
  }

  test("j: replace + delete in one query") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"first": 1, "second": 2, "third": 3}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |return (
        |  replace json value of $doc.first with 100,
        |  delete json $doc.second
        |)""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      """{"first":100,"third":3}""")
  }

  test("j: two deletes in one query") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"first": 1, "second": 2, "third": 3}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |return (
        |  delete json $doc.first,
        |  delete json $doc.third
        |)""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      """{"second":2}""")
  }

  test("j: three updates in one query") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"a": 1, "b": 2, "c": 3}')""",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |return (
        |  replace json value of $doc.a with 10,
        |  replace json value of $doc.b with 20,
        |  replace json value of $doc.c with 30
        |)""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      """{"a":10,"b":20,"c":30}""")
  }

  test("j: sequential updates without a let binding see each other's state") {
    check(Seq("""jn:store('json-path1','mydoc.jn','{"first": 1, "second": 2}')""",
      """(
        |  replace json value of jn:doc('json-path1','mydoc.jn').first with 10,
        |  replace json value of jn:doc('json-path1','mydoc.jn').second with 20
        |)""".stripMargin),
      "jn:doc('json-path1','mydoc.jn')",
      """{"first":10,"second":20}""")
  }

  // ---- temporal axis (jn:doc revisions, jn:all-times) ----

  test("j: re-store is a new revision; jn:doc time-travels") {
    val st = freshStore()
    JsoniqRun.serialize(st, """jn:store('c','doc.jn','{"v": 1}')""")
    JsoniqRun.serialize(st, """jn:store('c','doc.jn','{"v": 2}')""")
    assert(JsoniqRun.serialize(st, """jn:doc('c','doc.jn').v""") == "2")
    assert(JsoniqRun.serialize(st, """jn:doc('c','doc.jn', 1).v""") == "1")
    assert(JsoniqRun.serialize(st,
      """for $d in jn:all-times(jn:doc('c','doc.jn')) return $d.v""") == "1 2")
    assert(JsoniqRun.serialize(st,
      """count(jn:all-times(jn:doc('c','doc.jn')))""") == "2")
  }

  test("j: nested constructors keep sibling entries (exact-name cleanup)") {
    // an inner ctor's temp-column cleanup once swept an OUTER ctor's
    // accumulated entry columns by prefix — the first entry vanished
    check(Nil, """{"a": 1, "b": {"c": 2}, "d": [3, {"e": 4}]}""",
      """{"a":1,"b":{"c":2},"d":[3,{"e":4}]}""")
    check(Nil, """[{"x": 1}, [2, {"y": 3}], 4]""",
      """[{"x":1},[2,{"y":3}],4]""")
    check(Nil,
      """for $i in 1 to 2 return {"n": $i, "obj": {"sq": $i * $i}}""",
      """{"n":1,"obj":{"sq":1}} {"n":2,"obj":{"sq":4}}""")
  }

  test("j: FLWOR order by descending over computed keys") {
    val st = freshStore()
    JsoniqRun.serialize(st,
      """jn:store('c','o.jn','[{"n": 2},{"n": 9},{"n": 4}]')""")
    assert(JsoniqRun.serialize(st,
      """for $i in jn:doc('c','o.jn') order by $i.n descending return $i.n""")
      == "9 4 2")
    assert(JsoniqRun.serialize(st,
      """sum((for $i in jn:doc('c','o.jn') return $i).n)""") == "15")
  }

  test("j: jn:valid-at stabs the valid axis (closed, open-ended, unregistered)") {
    val st = freshStore()
    st.store("bt", "emp.jn",
      """[{"name":"Alice","validFrom":"2020-01-01T00:00:00Z","validTo":"2020-12-31T23:59:59Z"},""" +
        """{"name":"Bob","validFrom":"2020-06-01T00:00:00Z"},""" +
        """{"name":"Charlie","validFrom":"2019-01-01T00:00:00Z","validTo":"2019-12-31T23:59:59Z"},""" +
        """{"name":"Dave"}]""")
    // mid-2020: Alice (closed interval), Bob (open-ended to); NOT
    // Charlie (2019 only), NOT Dave (no valid fields = unregistered)
    assert(JsoniqRun.serialize(st,
      "for $r in jn:valid-at('bt','emp.jn', xs:dateTime('2020-07-01T12:00:00Z')) return $r.name")
      == "\"Alice\" \"Bob\"")
    // boundary instants are INCLUSIVE on both ends
    assert(JsoniqRun.serialize(st,
      "for $r in jn:valid-at('bt','emp.jn', xs:dateTime('2019-12-31T23:59:59Z')) return $r.name")
      == "\"Charlie\"")
    // custom field names via the optional arguments
    st.store("bt", "emp2.jn",
      """[{"name":"Eve","vf":"2021-01-01T00:00:00Z","vt":"2021-12-31T00:00:00Z"}]""")
    assert(JsoniqRun.serialize(st,
      "for $r in jn:valid-at('bt','emp2.jn', xs:dateTime('2021-06-01T00:00:00Z'), 'vf', 'vt') return $r.name")
      == "\"Eve\"")
  }

  test("j: jn:open-bitemporal stabs both axes") {
    val st = freshStore()
    st.store("bt", "h.jn",
      """[{"name":"Alice","validFrom":"2020-01-01T00:00:00Z","validTo":"2020-12-31T00:00:00Z"}]""")
    st.store("bt", "h.jn",
      """[{"name":"Alice","validFrom":"2020-01-01T00:00:00Z","validTo":"2020-12-31T00:00:00Z"},""" +
        """{"name":"Eve","validFrom":"2019-01-01T00:00:00Z","validTo":"2021-12-31T00:00:00Z"}]""")
    // transaction axis far future = head revision; valid axis varies
    assert(JsoniqRun.serialize(st,
      "for $r in jn:open-bitemporal('bt','h.jn', xs:dateTime('2100-01-01T00:00:00Z'), xs:dateTime('2020-07-01T00:00:00Z')) return $r.name")
      == "\"Alice\" \"Eve\"")
    assert(JsoniqRun.serialize(st,
      "for $r in jn:open-bitemporal('bt','h.jn', xs:dateTime('2100-01-01T00:00:00Z'), xs:dateTime('2019-06-01T00:00:00Z')) return $r.name")
      == "\"Eve\"")
  }

  test("j: jn:next / jn:first-existing / jn:last-existing revision axes") {
    val st = freshStore()
    st.store("c", "nx.jn", """{"v": 1}""")
    st.store("c", "nx.jn", """{"v": 2, "w": 9}""")
    st.store("c", "nx.jn", """{"v": 3, "w": 9}""")
    // jn:next over the all-times binding: the node at the FOLLOWING
    // revision; empty at the last (reference jn/temporal/Next.java)
    assert(JsoniqRun.serialize(st,
      "for $n in jn:all-times(jn:doc('c','nx.jn')) " +
        "where exists(jn:next($n)) return jn:next($n).v") == "2 3")
    // first-/last-existing select the revision the node first/last
    // exists in (FirstExisting.java / LastExisting.java); the `w` field
    // first exists at revision 2
    assert(JsoniqRun.serialize(st,
      "jn:first-existing(jn:doc('c','nx.jn')).v") == "1")
    assert(JsoniqRun.serialize(st,
      "jn:last-existing(jn:doc('c','nx.jn')).v") == "3")
    assert(JsoniqRun.serialize(st,
      "for $n in jn:first-existing(jn:doc('c','nx.jn').w) " +
        "return sdb:revision($n)") == "2")
  }

  test("j: resource valid-time configuration via jn:store options") {
    val st = freshStore()
    // the reference's 5-arg store form persists validFromPath/
    // validToPath in the resource config
    // (StoreValidTimeAutoIndexTest.java:96)
    JsoniqRun.serialize(st,
      """jn:store('c','vt.jn','[{"id": 1, "from": "2024-01-01T00:00:00Z", "to": "2024-06-30T00:00:00Z"},{"id": 2, "from": "2024-07-01T00:00:00Z"},{"id": 3}]', true(), {"validFromPath": "from", "validToPath": "to"})""")
    // jn:valid-at reads the configured fields — no per-call override
    assert(JsoniqRun.serialize(st,
      "for $r in jn:valid-at('c','vt.jn', xs:dateTime('2024-03-01T00:00:00Z')) return $r.id")
      == "1")
    // jn:scan-valid-time-index: same predicate through the config
    assert(JsoniqRun.serialize(st,
      "for $r in jn:scan-valid-time-index(jn:doc('c','vt.jn'), xs:dateTime('2024-08-01T00:00:00Z')) return $r.id")
      == "2")
    // unpaired options fail loudly (validTimePathOptionsMustBePaired)
    intercept[Exception](JsoniqRun.serialize(st,
      """jn:store('c','bad.jn','[]', true(), {"validFromPath": "from"})"""))
    // without a config the scan refuses, like the reference
    JsoniqRun.serialize(st, """jn:store('c','nocfg.jn','[{"a": 1}]')""")
    val e = intercept[Exception](JsoniqRun.serialize(st,
      "jn:scan-valid-time-index(jn:doc('c','nocfg.jn'), xs:dateTime('2024-08-01T00:00:00Z'))"))
    assert(e.getMessage.contains("valid time"), e.getMessage)
  }

  test("j: sdb:item-history yields the node only where it changed") {
    val st = freshStore()
    st.store("c", "ih.jn", """{"v": 1, "x": "a"}""")
    st.store("c", "ih.jn", """{"v": 1, "x": "b"}""") // v unchanged
    st.store("c", "ih.jn", """{"v": 2, "x": "b"}""")
    st.store("c", "ih.jn", """{"v": 2, "x": "c"}""") // v unchanged
    assert(JsoniqRun.serialize(st,
      "sdb:item-history(jn:doc('c','ih.jn').v)") == "1 2")
    // whole-document history: every revision is a change here
    assert(JsoniqRun.serialize(st,
      "count(sdb:item-history(jn:doc('c','ih.jn')))") == "4")
  }

  test("j: recursive declare function runs depth-capped") {
    val st = freshStore()
    // direct recursion: arithmetic fold (brackit compiles recursion
    // natively; here the inliner expands it depth-capped and the base
    // case's CASE WHEN arm stops evaluation before the cap)
    assert(JsoniqRun.serialize(st,
      "declare function local:sum($n) { if ($n le 0) then 0 " +
        "else $n + local:sum($n - 1) }; local:sum(10)") == "55")
    // recursion over stored data: depth-bounded tree fold
    st.store("c", "tree.jn",
      """{"v": 1, "kid": {"v": 2, "kid": {"v": 3, "kid": null}}}""")
    assert(JsoniqRun.serialize(st,
      "declare function local:fold($t) { if (empty($t.v)) then 0 " +
        "else $t.v + local:fold($t.kid) }; " +
        "local:fold(jn:doc('c','tree.jn'))") == "6")
    // mutual recursion
    assert(JsoniqRun.serialize(st,
      "declare function local:even($n) { if ($n eq 0) then true() " +
        "else local:odd($n - 1) }; " +
        "declare function local:odd($n) { if ($n eq 0) then false() " +
        "else local:even($n - 1) }; local:even(10)") == "true")
  }

  test("j: unbounded recursion fails loudly at the depth cap") {
    // no base case: every path reaches the overflow sentinel
    val e = intercept[Exception](JsoniqRun.serialize(freshStore(),
      "declare function local:f($n) { local:f($n) }; local:f(1)"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("recursi") &&
      m.contains("local:f")), msgs(e).mkString(" | "))
    // data recursing PAST the cap trips the same loud error
    val e2 = intercept[Exception](JsoniqRun.serialize(freshStore(),
      "declare function local:sum($n) { if ($n le 0) then 0 " +
        "else $n + local:sum($n - 1) }; local:sum(100)"))
    assert(msgs(e2).exists(_.contains("recursi")), msgs(e2).mkString(" | "))
  }

  test("j: comments strip in expressions, stay literal in element content") {
    // expression position: stripped (incl. nesting, strings untouched)
    check(Nil, "(: outer (: inner :) :) 1 + 1", "2")
    check(Nil, """(: drop :) "keep (:this:)" """, "\"keep (:this:)\"")
    // a '<' COMPARISON followed by a letter is not a constructor start
    // — comment stripping stays live after it
    check(Nil,
      "for $i in (1, 2, 3) where $i <count((1, 2)) (: keep small :) return $i",
      "1")
    // direct constructor TEXT CONTENT: '(:' is character data (the
    // reference grammar recognizes comments only where expressions may
    // appear) — and enclosed expressions re-enter comment stripping
    val st = freshStore()
    assert(JsoniqRun.serialize(st, "<a>price (:USD:)</a>")
      == "\"<a>price (:USD:)</a>\"")
    assert(JsoniqRun.serialize(st, "<a>n={ (: c :) 1 + 2 }</a>")
      == "\"<a>n=3</a>\"")
  }

  test("j: instance-of and EBV predicates over unboxed values (testNesting1/2)") {
    // JsonIntegrationTest.testNesting1: instance of + value comparison
    checkIgnoreNodeKeys(Seq("""jn:store('json-path1','mydoc.jn','[{"key":0},{"value":{"key":true}},{"key":"hey","value":false}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[].value where $i instance of object() and $i.key eq true() return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"key":true,"nodekey":7}""")
    // testNesting2: bare-field EBV filter after index DDL
    checkIgnoreNodeKeys(Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0},{"value":[{"key":{"boolean":true}},{"newkey":"yes"}]},{"key":"hey","value":false}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('//*', '//[]')) return {"revision": sdb:commit($doc)}"""),
      """for $i in jn:doc('json-path1','mydoc.jn')[].value[].key[?$$.boolean] return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"boolean":true,"nodekey":10}""")
  }

  test("j: non-existent paths yield the empty sequence (testNonExistentPath1/2)") {
    val setup = Seq(
      """jn:store('json-path1','mydoc.jn','[{"key":0},{"value":[{"key":{"boolean":true}},{"newkey":"yes"}]},{"key":"hey","value":false}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn') let $stats := jn:create-path-index($doc, ('//*', '//[]')) return {"revision": sdb:commit($doc)}""")
    check(setup,
      """jn:doc('json-path1','mydoc.jn')[].value[].key[?$$.boolean].nonExistent""",
      "")
    check(setup,
      """jn:doc('json-path1','mydoc.jn')[].value[].key.nonExistent""",
      "")
  }

  test("j: deep-equal where over array iteration (testArrayIteration)") {
    check(Seq("""jn:store('json-path1','mydoc.jn','[{"key":0,"value":true},{"key":"hey","value":false}]')"""),
      """for $i in jn:doc('json-path1','mydoc.jn') where deep-equal($i.key, 0) return { $i, "nodekey": sdb:nodekey($i) }""",
      """{"key":0,"value":true,"nodekey":2}""")
  }

  test("j: find-cas-index resolves a covering pattern (testCreateAndRetrieveValueFromCASIndex)") {
    // the index is declared over '//[]'; the scan finds it by the
    // CONCRETE '/[]/test/[]' it wants — handle resolution must match
    // patterns, not strings
    checkIgnoreNodeKeys(Seq(
      """jn:store('json-path1','mydoc.jn','[{"test": "test string"}, "b", {"test": ["a", {"blabla": "test blabla string"}, null, "b", "c"]}]')""",
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $stats := jn:create-cas-index($doc, 'xs:string', '//[]')
        |return {"revision": sdb:commit($doc)}""".stripMargin),
      """let $doc := jn:doc('json-path1','mydoc.jn')
        |let $casIndexNumber := jn:find-cas-index($doc, 'xs:string', '/[]/test/[]')
        |for $node in jn:scan-cas-index($doc, $casIndexNumber, 'b', '==', '/[]/test/[]')
        |order by sdb:revision($node), sdb:nodekey($node)
        |return {"nodeKey": sdb:nodekey($node), "node": $node, "path": sdb:path(sdb:select-parent($node))}""".stripMargin,
      """{"nodeKey":14,"node":"b","path":"/[2]/test/[]"}""")
  }

  test("j: empty $paths resolves the NAMED index's declared paths") {
    val st = freshStore()
    JsoniqRun.serialize(st,
      """jn:store('c','two.jn','{"foo": [1, 5, 9], "names": ["5", "x"]}')""")
    JsoniqRun.serialize(st,
      """let $d := jn:doc('c','two.jn')
        |let $s := jn:create-cas-index($d, 'xs:decimal', '/foo/[]')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    JsoniqRun.serialize(st,
      """let $d := jn:doc('c','two.jn')
        |let $s := jn:create-cas-index($d, 'xs:string', '/names/[]')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    // literal handle 0 = the decimal index over /foo/[] — the string
    // "5" under /names/[] must NOT leak into the range (the reference
    // scans exactly the index the handle names)
    assert(JsoniqRun.serialize(st,
      "count(jn:scan-cas-index-range(jn:doc('c','two.jn'), 0, 2, 10, " +
        "true(), true(), ()))") == "2")
    // literal handle 1 = the string index over /names/[]
    assert(JsoniqRun.serialize(st,
      "count(jn:scan-cas-index(jn:doc('c','two.jn'), 1, '5', '==', ()))")
      == "1")
    // a variable-bound handle over SEVERAL indexes is ambiguous — loud
    val e = intercept[Exception](JsoniqRun.serialize(st,
      """let $d := jn:doc('c','two.jn')
        |let $i := jn:find-cas-index($d, 'xs:decimal', '/foo/[]')
        |return count(jn:scan-cas-index-range($d, $i, 2, 10, true(), true(), ()))""".stripMargin))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("literal index number")),
      msgs(e).mkString(" | "))
  }

  test("j: CDATA and doubled-brace escapes are literal character data") {
    val st = freshStore()
    // CDATA: `{` is not an expression frame, `(:` is not a comment
    assert(JsoniqRun.serialize(st, "<a><![CDATA[f{x} (:keep:)]]></a>")
      == "\"<a>f{x} (:keep:)</a>\"")
    // doubled braces escape to ONE literal brace; comments are not
    // recognized inside the escaped character data
    assert(JsoniqRun.serialize(st, "<a>{{ (:keep:) }}</a>")
      == "\"<a>{ (:keep:) }</a>\"")
    // attribute values take the same escapes
    assert(JsoniqRun.serialize(st, """<a b="x{{y}}z"/>""")
      == "\"<a b=\\\"x{y}z\\\"/>\"")
  }

  test("j: arithmetic falls back to double past the working decimal scale") {
    // decimal(18,6) try_cast ROUNDS on scale overflow — a scale-7
    // operand must route to the double branch, not compute 1 + 1e-7 = 1
    check(Nil, "1 + 0.0000001", "1.0000001")
    check(Nil, "3 - 0.0000001", "2.9999999")
    // the exact-decimal discipline is untouched for in-scale operands
    check(Nil, "2.20371 * 100", "220.371")
    check(Nil, "round(2.20371 * 100) div 100", "2.2")
  }

  test("j: jn:diff escapes hostile object keys into valid JSON") {
    val st = freshStore()
    // keys holding a quote and a backslash (stored via the API — the
    // query lexer itself unescapes string literals)
    st.store("c", "k.jn", """{"a\"b": 1, "c\\d": 2}""")
    st.store("c", "k.jn", """{"a\"b": 9, "c\\d": 2}""")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = JsoniqRun.serialize(st, "jn:diff('c','k.jn', 1, 2)")
    // the serialized item is a JSON string; its CONTENT (the update
    // script) must itself PARSE — hostile keys once broke the text
    val script = mapper.readTree(out).asText()
    val node = mapper.readTree(script)
    val diffs = node.get("diffs")
    assert(diffs.size() == 1, script)
    assert(diffs.get(0).get("path").asText() == "/a\"b", script)
    assert(diffs.get(0).get("value").asInt() == 9, script)
  }

  test("j: a literal handle naming no registered index fails loudly") {
    val st = freshStore()
    JsoniqRun.serialize(st, """jn:store('c','inf.jn','{"foo": [1, 5]}')""")
    JsoniqRun.serialize(st,
      """let $d := jn:doc('c','inf.jn')
        |let $s := jn:create-cas-index($d, 'xs:decimal', '/foo/[]')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // the registry exists: a wrong literal handle — including the -1 a
    // failed jn:find-*-index returns — is the reference's
    // ERR_INDEX_NOT_FOUND (ScanPathIndex.java:64), never a wider scan
    for (q <- Seq(
      "count(jn:scan-cas-index(jn:doc('c','inf.jn'), 7, '5', '==', ()))",
      "count(jn:scan-cas-index-range(jn:doc('c','inf.jn'), -1, 2, 10, " +
        "true(), true(), ()))",
      "count(jn:scan-path-index(jn:doc('c','inf.jn'), 0, '/foo/[]'))",
      "count(jn:scan-name-index(jn:doc('c','inf.jn'), 3, 'foo'))")) {
      val e = intercept[Exception](JsoniqRun.serialize(st, q))
      assert(msgs(e).exists(_.contains("SIRIXDBF0002")),
        q + " -> " + msgs(e).mkString(" | "))
    }
    // the right-kind literal still serves
    assert(JsoniqRun.serialize(st,
      "count(jn:scan-cas-index(jn:doc('c','inf.jn'), 0, 5, '==', ()))")
      == "1")
    // registry-less resources keep the positional-fiction handles
    JsoniqRun.serialize(st, """jn:store('c','free.jn','{"foo": [1, 5]}')""")
    assert(JsoniqRun.serialize(st,
      "count(jn:scan-cas-index(jn:doc('c','free.jn'), 0, 5, '==', " +
        "'/foo/[]'))") == "1")
  }

  test("j: jn:previous/jn:next are strictly the adjacent revision") {
    val st = freshStore()
    // 'w' exists at revisions 1 and 3 but NOT 2: the reference's
    // Previous/NextAxis open revision±1 and moveTo the node, so a gap
    // yields the empty sequence — never the nearest existing revision
    JsoniqRun.serialize(st, """jn:store('c','adj.jn','{"v": 1, "w": 10}')""")
    JsoniqRun.serialize(st, """jn:store('c','adj.jn','{"v": 2}')""")
    JsoniqRun.serialize(st, """jn:store('c','adj.jn','{"v": 3, "w": 30}')""")
    assert(JsoniqRun.serialize(st,
      "for $n in jn:all-times(jn:doc('c','adj.jn').w) " +
        "return (exists(jn:previous($n)), exists(jn:next($n)))")
      == "false false false false")
    // gap-less neighbours still serve content
    assert(JsoniqRun.serialize(st,
      "for $n in jn:all-times(jn:doc('c','adj.jn').v) " +
        "return (jn:previous($n), jn:next($n))")
      == "2 1 3 2")
    // item-history keeps the nearest-existing change compare: both
    // existences of 'w' count (10 then 30)
    assert(JsoniqRun.serialize(st,
      "count(sdb:item-history(jn:doc('c','adj.jn').w))") == "2")
  }

  test("j: catalog ops — exists/drop for databases and resources") {
    val st = freshStore()
    def ser(q: String) = JsoniqRun.serialize(st, q)
    ser("""jn:store('db1','a.jn','{"x": 1}')""")
    ser("""jn:store('db1','b.jn','{"x": 2}')""")
    assert(ser("jn:exists-database('db1')") == "true")
    assert(ser("jn:exists-resource('db1','a.jn')") == "true")
    // drop one resource: the database and its sibling survive
    ser("jn:drop-resource('db1','a.jn')")
    assert(ser("jn:exists-resource('db1','a.jn')") == "false")
    assert(ser("jn:exists-resource('db1','b.jn')") == "true")
    assert(ser("jn:exists-database('db1')") == "true")
    // a re-created resource starts at revision 1 with fresh content
    ser("""jn:store('db1','a.jn','{"x": 9}')""")
    assert(ser("jn:doc('db1','a.jn')") == "{\"x\":9}")
    assert(ser("sdb:most-recent-revision(jn:doc('db1','a.jn'))") == "1")
    // drop the whole database
    ser("jn:drop-database('db1')")
    assert(ser("jn:exists-database('db1')") == "false")
    assert(ser("jn:exists-resource('db1','b.jn')") == "false")
    // dropping a missing target is the reference's loud null lookup
    intercept[Exception](ser("jn:drop-database('db1')"))
    intercept[Exception](ser("jn:drop-resource('nope','x.jn')"))
  }

  test("j: dropping a SHREDDED resource evicts every per-revision cache") {
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val st = freshStore()
      val doc = (1 to 20).map(i => s"""{"v": $i}""").mkString("[", ",", "]")
      st.store("c", "ev.jn", doc)
      assert(st.isShredded("c", "ev.jn"))
      // prime skeleton + member caches through a scan
      assert(JsoniqRun.serialize(st,
        "count(jn:scan-path-index(jn:doc('c','ev.jn'), 0, '/[]/v'))") == "20")
      JsoniqRun.serialize(st, "jn:drop-resource('c','ev.jn')")
      // a smaller re-created resource must serve ITS content, never a
      // stale skeleton/shred/member frame
      st.store("c", "ev.jn", """[{"v": 100}]""")
      assert(JsoniqRun.serialize(st,
        "count(jn:scan-path-index(jn:doc('c','ev.jn'), 0, '/[]/v'))") == "1")
      assert(JsoniqRun.serialize(st,
        "jn:doc('c','ev.jn')[0].v") == "100")
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("j: projection index DDL — create/find/drop/find-after-drop") {
    val st = freshStore()
    def ser(q: String) = JsoniqRun.serialize(st, q)
    ser("""jn:store('c','pr.jn','[{"a": 1, "b": "x"},{"a": 2, "b": "y"}]')""")
    // create returns a handle; an identical shape is idempotent
    assert(ser("""jn:create-projection-index(jn:doc('c','pr.jn'), '/[]', ('a','b'), ('long','string'))""") == "0")
    assert(ser("""jn:create-projection-index(jn:doc('c','pr.jn'), '/[]', ('a','b'))""") == "0")
    // a different shape is a SECOND projection
    assert(ser("""jn:create-projection-index(jn:doc('c','pr.jn'), '/[]', 'a')""") == "1")
    // find by shape; unknown shape = -1 (reference FindProjectionIndex)
    assert(ser("""jn:find-projection-index(jn:doc('c','pr.jn'), '/[]', ('a','b'))""") == "0")
    assert(ser("""jn:find-projection-index(jn:doc('c','pr.jn'), '/[]', 'zz')""") == "-1")
    // the reference REJECTS double columns (silent degradation)
    intercept[Exception](ser(
      """jn:create-projection-index(jn:doc('c','pr.jn'), '/[]', 'a', 'double')"""))
    // drop by number; find-after-drop = -1; other projections survive
    ser("""jn:drop-projection-index(jn:doc('c','pr.jn'), 0)""")
    assert(ser("""jn:find-projection-index(jn:doc('c','pr.jn'), '/[]', ('a','b'))""") == "-1")
    assert(ser("""jn:find-projection-index(jn:doc('c','pr.jn'), '/[]', 'a')""") == "1")
    // numbering never reuses a dropped handle
    assert(ser("""jn:create-projection-index(jn:doc('c','pr.jn'), '/[]', 'b')""") == "2")
    // dropping a missing number is index-not-found
    intercept[Exception](ser(
      """jn:drop-projection-index(jn:doc('c','pr.jn'), 9)"""))
    // no-number drop removes EVERY projection
    ser("""jn:drop-projection-index(jn:doc('c','pr.jn'))""")
    assert(ser("""jn:find-projection-index(jn:doc('c','pr.jn'), '/[]', 'a')""") == "-1")
  }

  test("j: create-valid-time-index without config fails loudly") {
    val st = freshStore()
    JsoniqRun.serialize(st, """jn:store('c','nc.jn','[{"id": 1}]')""")
    val e = intercept[Exception](JsoniqRun.serialize(st,
      "jn:create-valid-time-index(jn:doc('c','nc.jn'))"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("valid time configuration")),
      msgs(e).mkString(" | "))
  }

  test("j: temporal axis-step syntax desugars onto the function routes") {
    val st = freshStore()
    def ser(q: String) = JsoniqRun.serialize(st, q)
    ser("""jn:store('c','ax2.jn','{"v": 1}')""")
    ser("""jn:store('c','ax2.jn','{"v": 2}')""")
    ser("""jn:store('c','ax2.jn','{"v": 3}')""")
    // each axis form must answer identically to its function form
    // (reference SirixTranslator.java:208-216 — the axes share the
    // temporal-function implementations)
    val pairs = Seq(
      "for $d in jn:doc('c','ax2.jn', 2)/past::* return $d.v" ->
        "for $d in jn:past(jn:doc('c','ax2.jn', 2)) return $d.v",
      "for $d in jn:doc('c','ax2.jn', 2)/past-or-self::* return $d.v" ->
        "for $d in jn:past(jn:doc('c','ax2.jn', 2), true) return $d.v",
      "for $d in jn:doc('c','ax2.jn', 2)/future::* return $d.v" ->
        "for $d in jn:future(jn:doc('c','ax2.jn', 2)) return $d.v",
      "for $d in jn:doc('c','ax2.jn', 2)/future-or-self::* return $d.v" ->
        "for $d in jn:future(jn:doc('c','ax2.jn', 2), true) return $d.v",
      "for $d in jn:doc('c','ax2.jn')/all-times::* return $d.v" ->
        "for $d in jn:all-times(jn:doc('c','ax2.jn')) return $d.v",
      "(jn:doc('c','ax2.jn')/first::*).v" ->
        "jn:first(jn:doc('c','ax2.jn')).v",
      "(jn:doc('c','ax2.jn')/last::*).v" ->
        "jn:last(jn:doc('c','ax2.jn')).v",
      ("for $n in jn:all-times(jn:doc('c','ax2.jn')) " +
        "return (($n/previous::*).v, ($n/next::*).v)") ->
        ("for $n in jn:all-times(jn:doc('c','ax2.jn')) " +
          "return (jn:previous($n).v, jn:next($n).v)"))
    pairs.foreach { case (axisQ, fnQ) =>
      assert(ser(axisQ) == ser(fnQ), axisQ)
    }
    // pinned values for the first/composite forms (not just equality)
    assert(ser("for $d in jn:doc('c','ax2.jn', 2)/past::* return $d.v")
      == "1")
    assert(ser("(jn:doc('c','ax2.jn')/last::*).v") == "3")
    // structural axes through the same grammar
    assert(ser("""count(jn:doc('c','ax2.jn')/child::v)""") == "0")
    // a temporal axis with a non-* node test is loud
    intercept[Exception](ser("jn:doc('c','ax2.jn')/past::foo"))
  }

  test("j: jn:size/members/keys/values (brackit JSONFun surface)") {
    val st = freshStore()
    def ser(q: String) = JsoniqRun.serialize(st, q)
    ser("""jn:store('c','bi.jn','{"a":[1,2,3,4],"o":{"x":1,"b":{"y":2},"c":"s"}}')""")
    // count(E[]) ≡ jn:size(E) — the reference's ArrayCountToSizeStage
    // rewrite's soundness contract, checked as a VALUE equivalence
    assert(ser("jn:size(jn:doc('c','bi.jn').a)") === "4")
    assert(ser("count(jn:doc('c','bi.jn').a[])") ===
      ser("jn:size(jn:doc('c','bi.jn').a)"))
    assert(ser("jn:members(jn:doc('c','bi.jn').a)") === "1 2 3 4")
    assert(ser("count(jn:members(jn:doc('c','bi.jn').a))") === "4")
    // INSERTION member order (r16): order comes from the stored text,
    // matching brackit JSONFun's member iteration
    assert(ser("jn:keys(jn:doc('c','bi.jn').o)") === "\"x\" \"b\" \"c\"")
    assert(ser("jn:values(jn:doc('c','bi.jn').o)") ===
      "1 {\"y\":2} \"s\"")
    // jn:keys dedupes across a sequence of objects (first occurrence)
    ser("""jn:store('c','bi2.jn','[{"k":1,"m":2},{"k":3,"z":4}]')""")
    assert(ser("jn:keys(jn:doc('c','bi2.jn')[])") === "\"k\" \"m\" \"z\"")
    assert(ser("jn:values(jn:doc('c','bi2.jn')[])") === "1 2 3 4")
  }

  test("j: number fidelity — overflow strings, INF sums, exact decimals") {
    val st = freshStore()
    def ser(q: String) = JsoniqRun.serialize(st, q)
    // |x| beyond xs:double: the store keeps exact plain digits (the
    // reference's BigDecimal path; its sweep pins 2e308 round-tripping)
    ser("""jn:store('c','num.jn','{"x":2e308,"y":1.5}')""")
    assert(ser("jn:doc('c','num.jn').x") ===
      "\"2" + "0" * 308 + "\"")
    // double overflow in arithmetic serializes as INF (XQuery lexical)
    ser("""jn:store('c','inf.jn','[1e308,1e308]')""")
    assert(ser("sum(jn:doc('c','inf.jn')[])") === "\"INF\"")
    // decimal arithmetic stays exact (0.1 + 0.2 = 0.3, not 0.30000...4)
    ser("""jn:store('c','dec.jn','{"a":0.1,"b":0.2}')""")
    assert(ser("jn:doc('c','dec.jn').a + jn:doc('c','dec.jn').b") === "0.3")
  }
}
