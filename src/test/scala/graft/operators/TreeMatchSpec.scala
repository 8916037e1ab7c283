package graft.operators

import graft.SparkSpec
import graft.sources.XmlShredder
import org.apache.spark.sql.functions._

class TreeMatchSpec extends SparkSpec {
  import spark.implicits._

  private def shred(xml: String) =
    XmlShredder.shred(Seq((1L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")

  // old: sec(p,p) then div(q) then old; new: div moved first, one text
  // edited, <old> deleted, <nw> inserted
  private lazy val aNodes = shred(
    "<root><sec><p>one</p><p>two</p></sec><div><q>three</q></div><old>gone</old></root>").cache()
  private lazy val bNodes = shred(
    "<root><div><q>three</q></div><sec><p>one</p><p>two-edit</p></sec><nw>add</nw></root>").cache()

  private def nameOf(nodes: org.apache.spark.sql.DataFrame, key: Long): String =
    nodes.filter($"node_key" === key)
      .select(coalesce($"name", $"value")).as[String].head()

  private lazy val matches =
    TreeMatch.matchTrees(aNodes, bNodes).cache()

  test("exact subtrees match with all their descendants (phase 1)") {
    val named = matches.as[(Long, Long, Long, Int)].collect().map {
      case (_, ak, bk, phase) => (nameOf(aNodes, ak), nameOf(bNodes, bk), phase)
    }.toSet
    // the moved <div><q>three</q></div> subtree matches exactly
    assert(named.contains(("div", "div", 1)))
    assert(named.contains(("q", "q", 1)))
    assert(named.contains(("three", "three", 1)))
    // <p>one</p> matches exactly despite the sibling edit
    assert(named.contains(("one", "one", 1)))
    // matches are 1-1
    val m = matches.select("a_key", "b_key").as[(Long, Long)].collect()
    assert(m.map(_._1).distinct.length == m.length)
    assert(m.map(_._2).distinct.length == m.length)
  }

  test("internal nodes match by child ratio; edited text matches under them") {
    val named = matches.as[(Long, Long, Long, Int)].collect().map {
      case (_, ak, bk, phase) => (nameOf(aNodes, ak), nameOf(bNodes, bk), phase)
    }.toSet
    // <sec> and <root> differ in content → phase 3 via matched children
    assert(named.contains(("sec", "sec", 3)))
    assert(named.contains(("root", "root", 3)))
    // the edited text pairs value-agnostically under its matched parent
    assert(named.exists { case (av, bv, p) => av == "two" && bv == "two-edit" && p == 4 })
  }

  test("10+ same-hash siblings pair in TRUE document order, not string order") {
    // a has identical <x>v</x> leaves at sibling positions 2 and 11; b has
    // one at position 2 only. The dot-joined STRING ranking ordered
    // "1.11" before "1.2", pairing b's leaf with a's ELEVENTH sibling —
    // a crossed match surfacing as a bogus move + delete of the true
    // counterpart. Array ordering pairs position 2 with position 2.
    val fillers = (1 to 9).map(i => s"<f$i/>").mkString
    val aN = shred(s"<r><a0/><x>v</x>$fillers<x>v</x></r>")
    val bN = shred(s"<r><a0/><x>v</x></r>")
    val m = TreeMatch.matchTrees(aN, bN)
    val aPos2 = aN.filter($"kind" === "element" && $"name" === "x")
      .orderBy("node_seq").select("node_key").as[Long].collect()
    val bX = bN.filter($"kind" === "element" && $"name" === "x")
      .select("node_key").as[Long].head()
    val matchedA = m.filter($"b_key" === bX).select("a_key").as[Long].collect()
    assert(matchedA.toSeq == Seq(aPos2.head),
      s"b's x paired with a's ${matchedA.toSeq}, expected first-in-doc-order ${aPos2.head}")
  }

  test("edit script classifies delete/insert/update and detects moves") {
    val script = TreeMatch.editScript(aNodes, bNodes, matches)
    val ops = script.as[(Long, String, Option[Long], Option[Long])].collect().map {
      case (_, op, ak, bk) =>
        (op, ak.map(nameOf(aNodes, _)).getOrElse(""), bk.map(nameOf(bNodes, _)).getOrElse(""))
    }.toSet
    assert(ops.contains(("delete", "old", "")))
    assert(ops.contains(("delete", "gone", "")))
    assert(ops.contains(("insert", "", "nw")))
    assert(ops.contains(("insert", "", "add")))
    assert(ops.contains(("update", "two", "two-edit")))
    // div kept its (matched) parent: position changes are NOT moves
    assert(!ops.exists { case (op, a, _) => op == "move" && a == "div" })
  }

  test("a genuinely re-parented subtree is a move") {
    val a2 = shred("<r><x><s>keep</s></x><y/></r>")
    val b2 = shred("<r><x/><y><s>keep</s></y></r>")
    val m2 = TreeMatch.matchTrees(a2, b2)
    val script = TreeMatch.editScript(a2, b2, m2)
    val moves = script.filter($"op" === "move")
      .join(a2.select($"node_key".as("a_key"), $"name"), "a_key")
      .select("name").as[String].collect().toSet
    assert(moves == Set("s"), s"expected <s> to move, got $moves")
  }

  test("scales across many document pairs in one call (doc_id-local)") {
    val docs = (1L to 20L)
    val aMany = XmlShredder.shred(
      docs.map(i => (i, s"<d><v>a$i</v><k>$i</k></d>")).toDF("doc_id", "xml"),
      "doc_id", "xml")
    val bMany = XmlShredder.shred(
      docs.map(i => (i, s"<d><v>b$i</v><k>$i</k></d>")).toDF("doc_id", "xml"),
      "doc_id", "xml")
    val m = TreeMatch.matchTrees(aMany, bMany)
    // all 5 nodes per doc match doc-locally: root d, k + its text (exact),
    // v (context), v's edited text (leaf value)
    assert(m.groupBy("doc_id").count().select("count").distinct()
      .as[Long].collect().toSeq == Seq(5))
    val updates = TreeMatch.editScript(aMany, bMany, m).filter($"op" === "update")
    assert(updates.count() == 20) // exactly the per-doc edited text
  }
}
