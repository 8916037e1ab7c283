package graft.query

import graft.SparkSpec

/** Distributed node-key resolution over shredded revisions
  * ([[JsoniqRun]]'s distributedKeyLookup: skeleton keys broadcast,
  * member keys through the bucketed offsets layout + executor-side
  * relative walks) must agree EXACTLY with the driver tree path
  * (NodeKeys.build over the full document) — same queries run against
  * a shredded store (threshold 1 byte) and an unshredded one. */
class NodeKeyShredSpec extends SparkSpec {

  private def withShredded[A](body: JsoniqRun.Store => A): A = {
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try body(new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("graft-nkshred").toString))
    finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }
  private def plainStore(): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("graft-nkplain").toString)

  // object-rooted with TWO shreddable arrays and fields BEFORE, BETWEEN
  // and AFTER them — the skeleton assignment must continue numbering
  // across each elided member range
  private val doc = """{"meta": {"name": "corpus"}, "items": [""" +
    (1 to 20).map(i => s"""{"v": $i, "w": {"x": ${i % 3}}}""")
      .mkString(",") +
    """], "mid": true, "tags": [""" +
    (1 to 20).map(i => s""""t$i"""").mkString(",") + """], "tail": 9}"""

  private val queries = Seq(
    "sdb:nodekey(jn:doc('c','d'))",
    "sdb:nodekey(jn:doc('c','d').meta)",
    "sdb:nodekey(jn:doc('c','d').meta.name)",
    "sdb:nodekey(jn:doc('c','d').items)",
    "sdb:nodekey(jn:doc('c','d').mid)",
    "sdb:nodekey(jn:doc('c','d').tags)",
    "sdb:nodekey(jn:doc('c','d').tail)",
    "for $i in jn:doc('c','d').items[] return sdb:nodekey($i)",
    "for $i in jn:doc('c','d').items[] return sdb:nodekey($i.v)",
    "for $i in jn:doc('c','d').items[] return sdb:nodekey($i.w.x)",
    "for $t in jn:doc('c','d').tags[] return sdb:nodekey($t)")

  test("shredded and unshredded stores assign identical node keys") {
    val plain = plainStore()
    plain.store("c", "d", doc)
    val want = queries.map(q => JsoniqRun.serialize(plain, q))
    withShredded { st =>
      st.store("c", "d", doc)
      // the distributed arm must actually be eligible
      assert(st.shredEntries("c", "d", None).count(_.kind == "json") == 2)
      queries.zip(want).foreach { case (q, w) =>
        assert(JsoniqRun.serialize(st, q) === w, s"\nquery: $q")
      }
    }
  }

  test("member tables carry __nk_n equal to the lazy count expression") {
    // r17: the store's member walk writes each member's node count
    // (__nk_n) so the offsets build never re-parses members. The stored
    // counts must equal treeCounts(member_raw) + 1 — the exact
    // expression the pre-column fallback computes.
    withShredded { st =>
      st.store("c", "d", doc)
      st.shredEntries("c", "d", None).filter(_.kind == "json")
        .foreach { en =>
          val df = st.readShredEntry("c", "d", None, en)
          assert(df.columns.contains("__nk_n"), s"entry ${en.dir}")
          val rows = df.select("member_raw", "__nk_n").collect()
          assert(rows.nonEmpty)
          rows.foreach { r =>
            val (_, desc) = NodeKeys.treeCounts(r.getString(0), jsonOnly = true)
            assert(r.getLong(1) === desc + 1L, s"member ${r.getString(0)}")
          }
        }
    }
  }

  test("static pointers agree with NodeKeys.build ground truth") {
    val truth = NodeKeys.build(doc)
    withShredded { st =>
      st.store("c", "d", doc)
      def key(p: Either[String, Int]*): Long =
        truth.lookup(p.toList).map(_.key).get
      assert(JsoniqRun.serialize(st,
        "for $i in jn:doc('c','d').items[] return sdb:nodekey($i)")
        .split(" ").head.toLong === key(Left("items"), Right(0)))
      assert(JsoniqRun.serialize(st, "sdb:nodekey(jn:doc('c','d').tail)")
        .toLong === key(Left("tail")))
    }
  }

  test("root-array documents and nested-array members resolve distributed") {
    // chain = Nil (the root array IS the member table); members carry
    // nested ARRAYS whose inner nodes need relative-walk identity
    val rootDoc = (1 to 20).map(i =>
      s"""{"v": $i, "sub": [[$i], {"k": $i}]}""").mkString("[", ",", "]")
    val truth = NodeKeys.build(rootDoc)
    def key(p: Either[String, Int]*): Long =
      truth.lookup(p.toList).map(_.key).get
    val plain = plainStore()
    plain.store("c", "r", rootDoc)
    withShredded { st =>
      st.store("c", "r", rootDoc)
      assert(st.shredEntries("c", "r", None)
        .exists(e => e.kind == "json" && e.steps.isEmpty))
      val queries = Seq(
        "sdb:nodekey(jn:doc('c','r'))",
        "for $i in jn:doc('c','r')[] return sdb:nodekey($i)",
        "for $i in jn:doc('c','r')[] return sdb:nodekey($i.sub)",
        "sdb:nodekey(jn:doc('c','r')[7].sub[1].k)")
      queries.foreach { q =>
        assert(JsoniqRun.serialize(st, q) ===
          JsoniqRun.serialize(plain, q), s"\nquery: $q")
      }
      // and both agree with ground truth on the deep pointer
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:doc('c','r')[7].sub[1].k)").toLong ===
        key(Right(7), Left("sub"), Right(1), Left("k")))
    }
  }

  test("members whose FIELDS are named like the XML encoding still count as JSON") {
    // '~n'/'~a'/'~c' are legal JSON field names; the member-key layout
    // must never take the XML structural-count arm for them (it feeds
    // every subsequent member's offset)
    val tricky = """{"pad": 1, "items": [""" +
      (1 to 20).map(i =>
        s"""{"~n": "x$i", "~c": [1, 2], "v": $i}""").mkString(",") +
      """], "tail": 2}"""
    val truth = NodeKeys.build(tricky)
    withShredded { st =>
      st.store("c", "t", tricky)
      assert(st.shredEntries("c", "t", None).nonEmpty)
      // a late member's key is offset by every earlier member's FUSED
      // node count — wrong by (20 - i) x delta under the XML sniff
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:doc('c','t').items[19])").toLong ===
        truth.lookup(List(Left("items"), Right(19))).map(_.key).get)
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:doc('c','t').tail)").toLong ===
        truth.lookup(List(Left("tail"))).map(_.key).get)
    }
  }

  test("deref suffixes over scan hits address the INNER node's key") {
    withShredded { st =>
      st.store("c", "d", doc)
      JsoniqRun.serialize(st,
        """let $doc := jn:doc('c','d')
          |let $s := jn:create-path-index($doc, ('/items/[]/w', '/meta'))
          |return {"revision": sdb:commit($doc)}""".stripMargin)
      val truth = NodeKeys.build(doc)
      def key(p: Either[String, Int]*): Long =
        truth.lookup(p.toList).map(_.key).get
      // VarRef arm: suffix over MEMBER hits' identity paths — every
      // hit's INNER x field, in hit order
      assert(JsoniqRun.serialize(st,
        """for $n in jn:scan-path-index(jn:doc('c','d'), 0, '/items/[]/w')
          |return sdb:nodekey($n.x)""".stripMargin)
        === (0 to 19).map(i =>
          key(Left("items"), Right(i), Left("w"), Left("x")))
          .mkString(" "))
      // inline Call arm: suffix over a single skeleton hit
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:scan-path-index(jn:doc('c','d'), 0, '/meta').name)")
        === key(Left("meta"), Left("name")).toString)
    }
  }

  test("select-item inverts keys without the driver tree") {
    val truth = NodeKeys.build(doc)
    withShredded { st =>
      st.store("c", "d", doc)
      // a key deep inside the first member list
      val k1 = truth.lookup(List(Left("items"), Right(7), Left("w"),
        Left("x"))).map(_.key).get
      assert(JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), $k1)") === "2")
      // a skeleton key (field after both member lists)
      val k2 = truth.lookup(List(Left("tail"))).map(_.key).get
      assert(JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), $k2)") === "9")
      // a member's own key
      val k3 = truth.lookup(List(Left("tags"), Right(4))).map(_.key).get
      assert(JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), $k3)") === "\"t5\"")
      // absent key still throws
      intercept[IllegalArgumentException](JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), ${truth.maxKey + 10})"))
    }
  }

  test("scan-hit node keys resolve distributed (member CAS identity)") {
    withShredded { st =>
      st.store("c", "d", doc)
      JsoniqRun.serialize(st,
        """let $doc := jn:doc('c','d')
          |let $s := jn:create-cas-index($doc, 'xs:string', '/tags/[]')
          |return {"revision": sdb:commit($doc)}""".stripMargin)
      val got = JsoniqRun.serialize(st,
        """for $n in jn:scan-cas-index(jn:doc('c','d'), 0, 't3', '==', '/tags/[]')
          |return sdb:nodekey($n)""".stripMargin)
      val truth = NodeKeys.build(doc)
      assert(got === truth.lookup(List(Left("tags"), Right(2)))
        .map(_.key).get.toString)
      // RE-BINDING a CAS member hit keeps its identity: the hit prints
      // an empty self path (identity lives in ipath), so the re-bound
      // variable's path spec must read ipath — with path alone it
      // rendered "" and silently resolved to the document root (key 1)
      val rebound = JsoniqRun.serialize(st,
        """for $n in jn:scan-cas-index(jn:doc('c','d'), 0, 't3', '==', '/tags/[]')
          |for $x in $n
          |return sdb:nodekey($x)""".stripMargin)
      assert(rebound === truth.lookup(List(Left("tags"), Right(2)))
        .map(_.key).get.toString)
    }
  }
}
