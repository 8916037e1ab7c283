package graft.operators

import graft.SparkSpec
import graft.sources.XmlShredder

import java.nio.file.{Files, Paths}

/** Differential replay of the reference's versioned-XML diff corpora
  * (bundles/sirix-core/src/test/resources/revXMLs* — the fixtures its
  * FMSE algorithm is tested against, diff/algorithm/fmse/FMSE.java:67)
  * through the keyless [[TreeMatch]] path: each adjacent revision pair
  * shreds, matches, and derives an edit script; APPLYING the script to
  * revision k must reconstruct revision k+1 exactly.
  *
  * The apply realizes each op class the way a consumer would: deletes
  * drop A-nodes, updates rewrite a matched node's name/value to the
  * op's payload, moves re-parent to the op's target, inserts add the
  * carried subtree nodes. Reconstruction equality fails on every
  * mis-classification — an unmarked rename (stale name), a missed move
  * (parent mapping breaks), a duplicate match (mapping not 1-1), or a
  * missed insert/delete. */
class FmseRevXmlsSpec extends SparkSpec {
  import spark.implicits._

  private val Res = "/root/reference/bundles/sirix-core/src/test/resources"

  private final case class N(key: Long, parent: Option[Long], kind: String,
                             name: Option[String], value: Option[String])

  private def shred(xml: String) =
    XmlShredder.shred(Seq((1L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")

  private def nodesOf(df: org.apache.spark.sql.DataFrame): Map[Long, N] =
    df.select("node_key", "parent_key", "kind", "name", "value")
      .as[(Long, Option[Long], String, Option[String], Option[String])]
      .collect()
      .map { case (k, p, kd, n, v) => k -> N(k, p, kd, n, v) }.toMap

  /** One adjacent revision pair: match, script, reconstruct, compare. */
  private def roundTrip(corpus: String, xmlA: String, xmlB: String): Unit = {
    val a = shred(xmlA).cache()
    val b = shred(xmlB).cache()
    val aN = nodesOf(a)
    val bN = nodesOf(b)
    val matches = TreeMatch.matchTrees(a, b)
      .select("a_key", "b_key").as[(Long, Long)].collect()
    // the match is a 1-1 mapping with the roots paired
    val m = matches.toMap
    assert(m.size == matches.length, s"$corpus: duplicate a_key matches")
    assert(matches.map(_._2).distinct.length == matches.length,
      s"$corpus: duplicate b_key matches")
    val aRoot = aN.values.find(_.parent.isEmpty).get.key
    val bRoot = bN.values.find(_.parent.isEmpty).get.key
    assert(m.get(aRoot).contains(bRoot), s"$corpus: roots not matched")
    val script = TreeMatch.editScript(a, b, matches.toSeq
        .toDF("a_key", "b_key").withColumn("doc_id",
          org.apache.spark.sql.functions.lit(1L)))
      .select("op", "a_key", "b_key")
      .as[(String, Option[Long], Option[Long])].collect()
    val deletes = script.collect { case ("delete", Some(ak), _) => ak }.toSet
    val inserts = script.collect { case ("insert", _, Some(bk)) => bk }.toSet
    val updates = script.collect {
      case ("update", Some(ak), Some(bk)) => ak -> bk }.toMap
    val moves = script.collect {
      case ("move", Some(ak), Some(bk)) => ak -> bk }.toMap
    // deletes/inserts are exactly the unmatched node sets
    assert(deletes == aN.keySet -- m.keySet, s"$corpus: delete set")
    assert(inserts == bN.keySet -- m.values.toSet, s"$corpus: insert set")
    // APPLY: reconstruct revision B from A + the script's ops/payloads
    val recon: Map[Long, N] =
      (m.toSeq.map { case (ak, bk) =>
        val src = aN(ak)
        val payload = bN(bk) // update/move payloads (new name/value/target)
        val name = if (updates.contains(ak)) payload.name else src.name
        val value = if (updates.contains(ak)) payload.value else src.value
        val parent =
          if (moves.contains(ak)) payload.parent // the move op's target
          else src.parent.map(ap => m.getOrElse(ap,
            throw new AssertionError(
              s"$corpus: non-move pair $ak->$bk under unmatched parent $ap")))
        bk -> N(bk, parent, src.kind, name, value)
      } ++ inserts.toSeq.map(bk => bk -> bN(bk))).toMap
    assert(recon == bN,
      s"$corpus: reconstruction differs\n" +
        (recon.toSet -- bN.values.map(n => n.key -> n).toSet)
          .take(5).mkString("\n"))
    a.unpersist(); b.unpersist()
    ()
  }

  private def replayCorpus(corpus: String): Unit = {
    val dir = Paths.get(s"$Res/$corpus")
    if (!Files.isDirectory(dir)) cancel(s"reference corpus $corpus absent")
    val revs = Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".xml"))
      .sortBy(p => p.split("/").last.stripSuffix(".xml").toInt)
    assert(revs.length >= 2, s"$corpus: needs >= 2 revisions")
    revs.sliding(2).foreach { case Array(ra, rb) =>
      roundTrip(s"$corpus(${ra.split("/").last}->${rb.split("/").last})",
        new String(Files.readAllBytes(Paths.get(ra)), "UTF-8"),
        new String(Files.readAllBytes(Paths.get(rb)), "UTF-8"))
    }
  }

  test("revXMLsAll1/2/3: full-change corpora round-trip")(
    Seq("revXMLsAll1", "revXMLsAll2", "revXMLsAll3").foreach(replayCorpus))

  test("revXMLsDelete1: delete-heavy corpus round-trips")(
    replayCorpus("revXMLsDelete1"))

  test("revXMLsInsert1/2: insert-heavy corpora round-trip")(
    Seq("revXMLsInsert1", "revXMLsInsert2").foreach(replayCorpus))

  test("revXMLsSame1: identical revisions produce an empty script") {
    val dir = Paths.get(s"$Res/revXMLsSame1")
    if (!Files.isDirectory(dir)) cancel("reference corpus absent")
    val revs = Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".xml")).sorted
    val xml = new String(Files.readAllBytes(Paths.get(revs.head)), "UTF-8")
    val a = shred(xml); val b = shred(xml)
    val matches = TreeMatch.matchTrees(a, b)
    assert(TreeMatch.editScript(a, b, matches).count() == 0)
    roundTrip("revXMLsSame1", xml, xml)
  }

  test("revXMLsAll (graphml, namespaced): round-trips") {
    replayCorpus("revXMLsAll")
  }
}
