package graft.sources

import graft.SparkSpec
import graft.operators.Ordpath
import org.apache.spark.sql.functions._

class XmlShredderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, """<r id="5"><name>ALGERIA</name><pop>44</pop></r>"""),
    (2L, """<empty/>"""),
    (3L, """<a><b><c>deep</c></b>tail</a>""")).toDF("doc_id", "xml")

  private lazy val nodes = XmlShredder.shred(docs, "doc_id", "xml").cache()

  test("shred emits element/attribute/text nodes with document-order keys") {
    val d1 = nodes.filter($"doc_id" === 1L)
      .select("node_seq", "parent_seq", "kind", "name", "value", "ordpath")
      .as[(Int, Int, String, String, String, Seq[Int])].collect().sortBy(_._1)
    assert(d1.toSeq == Seq(
      (1, 0, "element", "r", null, Seq(1)),
      (2, 1, "attribute", "id", "5", Seq(1, 1)),
      (3, 1, "element", "name", null, Seq(1, 2)),
      (4, 3, "text", null, "ALGERIA", Seq(1, 2, 1)),
      (5, 1, "element", "pop", null, Seq(1, 3)),
      (6, 5, "text", null, "44", Seq(1, 3, 1))))
    // empty element: one node
    assert(nodes.filter($"doc_id" === 2L).count() == 1)
    // node_key/parent_key are globally unique equi-join keys
    val joined = nodes.as("c").join(nodes.as("p"),
      col("c.parent_key") === col("p.node_key"))
    assert(joined.count() == nodes.filter($"parent_key".isNotNull).count())
    assert(joined.filter(col("c.doc_id") =!= col("p.doc_id")).count() == 0)
  }

  test("XPath axes work over shredded ordpaths") {
    val d3 = nodes.filter($"doc_id" === 3L)
    // descendant axis of <a> (ordpath [1]) = b, c, 'deep', 'tail'
    val descendants = d3.filter(
        Ordpath.isDescendant($"ordpath", array(lit(1))) && $"node_seq" =!= 1)
    assert(descendants.count() == 4)
    // parent of the deep text node is <c>
    val deepText = d3.filter($"kind" === "text" && $"value" === "deep")
      .select("parent_seq").as[Int].head()
    val parentName = d3.filter($"node_seq" === deepText)
      .select("name").as[String].head()
    assert(parentName == "c")
    // document order: ancestors precede descendants, siblings by position
    val ordered = d3.orderBy("node_seq").select("ordpath").as[Seq[Int]].collect()
    ordered.sliding(2).foreach { case Array(a, b) =>
      // node_seq order must agree with ordpath document order
      assert(a.zipAll(b, -1, 99).find { case (x, y) => x != y }
        .forall { case (x, y) => x < y })
    case _ => ()
    }
  }

  test("serialize is the shredder's inverse") {
    val back = XmlShredder.serialize(nodes)
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    assert(back(1L) == """<r id="5"><name>ALGERIA</name><pop>44</pop></r>""")
    assert(back(2L) == "<empty/>")
    assert(back(3L) == "<a><b><c>deep</c></b>tail</a>")
  }

  test("comments and processing instructions are first-class nodes that round-trip") {
    // reference models COMMENT/PI as node kinds (node/xml/CommentNode.java,
    // PINode.java); the shredder must not silently drop them
    val doc = """<!--hdr--><r><?audit level="2"?><a>X</a><!--mid-->tail<?go?></r><!--tl-->"""
    val n = XmlShredder.shred(Seq((7L, doc)).toDF("doc_id", "xml"), "doc_id", "xml")
    val kinds = n.orderBy("node_seq")
      .select("kind", "name", "value", "parent_seq")
      .as[(String, String, String, Int)].collect().toSeq
    assert(kinds == Seq(
      ("comment", null, "hdr", 0),
      ("element", "r", null, 0),
      ("pi", "audit", """level="2"""", 2),
      ("element", "a", null, 2),
      ("text", null, "X", 4),
      ("comment", null, "mid", 2),
      ("text", null, "tail", 2),
      ("pi", "go", "", 2),
      ("comment", null, "tl", 0)))
    // top-level siblings get distinct ordpaths (document order holds)
    val topPaths = n.filter($"parent_seq" === 0).orderBy("node_seq")
      .select("ordpath").as[Seq[Int]].collect().toSeq
    assert(topPaths == Seq(Seq(1), Seq(2), Seq(3)))
    val rt = XmlShredder.serialize(n).select("xml").as[String].head()
    assert(rt == doc, "comment/PI round-trip must be byte-identical")
  }

  test("namespace declarations and prefixed names round-trip") {
    val doc = """<x:r xmlns:x="urn:a" xmlns="urn:d" x:id="1"><y/></x:r>"""
    val n = XmlShredder.shred(Seq((8L, doc)).toDF("doc_id", "xml"), "doc_id", "xml")
    val ns = n.filter($"kind" === "namespace").orderBy("node_seq")
      .select("name", "value").as[(String, String)].collect().toSeq
    assert(ns == Seq(("x", "urn:a"), (null, "urn:d")))
    assert(n.filter($"kind" === "element").select("name").as[String]
      .collect().toSet == Set("x:r", "y"))
    assert(n.filter($"kind" === "attribute").select("name", "value")
      .as[(String, String)].head() == ("x:id", "1"))
    val rt = XmlShredder.serialize(n).select("xml").as[String].head()
    assert(rt == doc)
    // attr-before-xmlns input: StAX does not expose the interleaving, so
    // the round trip CANONICALIZES to ns-first (same infoset, documented)
    val mixed = """<r a="1" xmlns:x="u"><x:y/></r>"""
    val n2 = XmlShredder.shred(Seq((9L, mixed)).toDF("doc_id", "xml"),
      "doc_id", "xml")
    val rt2 = XmlShredder.serialize(n2).select("xml").as[String].head()
    assert(rt2 == """<r xmlns:x="u" a="1"><x:y/></r>""")
    // idempotent: canonical output round-trips byte-identically
    val n3 = XmlShredder.shred(Seq((9L, rt2)).toDF("doc_id", "xml"),
      "doc_id", "xml")
    assert(XmlShredder.serialize(n3).select("xml").as[String].head() == rt2)
  }

  test("escaped content round-trips; DTD/external entities rejected") {
    val hostile = Seq((1L, "<d a=\"x&amp;y\">1 &lt; 2</d>")).toDF("doc_id", "xml")
    val n = XmlShredder.shred(hostile, "doc_id", "xml")
    assert(n.filter($"kind" === "text").select("value").as[String].head() == "1 < 2")
    assert(n.filter($"kind" === "attribute").select("value").as[String].head() == "x&y")
    val rt = XmlShredder.serialize(n).select("xml").as[String].head()
    assert(rt == "<d a=\"x&amp;y\">1 &lt; 2</d>")
    // a doc with a DTD must fail to shred, not resolve entities
    val dtd = Seq((1L, """<!DOCTYPE d [<!ENTITY e SYSTEM "file:///etc/passwd">]><d>&e;</d>"""))
      .toDF("doc_id", "xml")
    intercept[org.apache.spark.SparkException] {
      XmlShredder.shred(dtd, "doc_id", "xml").collect()
    }
  }
}
