package graft.operators

import graft.SparkSpec
import graft.sources.XmlShredder
import org.apache.spark.sql.functions._

/** Golden-fixture differential for the FMSE path (reference pins FMSE
  * against its revXMLs* corpora — bundles/sirix-core/src/test/resources/,
  * diff/algorithm/fmse/FMSE.java:67). Two hand-written XML revisions in
  * the same style, with the COMPLETE edit script asserted — not just
  * membership — covering a value update, a rename, a re-parenting move,
  * an insert and a delete; plus an agreement check against the keyed
  * [[Diff]] path on trees where stable keys exist. */
class FmseGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def shred(xml: String) =
    XmlShredder.shred(Seq((1L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")

  // revision 1 → revision 2, five edits:
  //   update : text 1965 → 1966 (inside the first book)
  //   rename : <shelf> → <bookcase> (both book subtrees intact)
  //   move   : <box>old papers</box> re-parented archive → lobby
  //   delete : <archive> (emptied by the move)
  //   insert : <lamp/> into lobby
  private lazy val rev1 = shred(
    """<library><shelf id="a"><book><title>Dune</title><year>1965</year></book>
      |<book><title>Emma</title><year>1815</year></book></shelf>
      |<archive><box>old papers</box></archive>
      |<lobby><plant/></lobby></library>""".stripMargin.replace("\n", "")).cache()
  private lazy val rev2 = shred(
    """<library><bookcase id="a"><book><title>Dune</title><year>1966</year></book>
      |<book><title>Emma</title><year>1815</year></book></bookcase>
      |<lobby><plant/><box>old papers</box><lamp/></lobby></library>""".stripMargin
      .replace("\n", "")).cache()

  private def nameOf(nodes: org.apache.spark.sql.DataFrame, key: Long): String =
    nodes.filter($"node_key" === key)
      .select(coalesce($"name", $"value")).as[String].head()

  test("golden edit script: exactly update+rename+move+delete+insert") {
    val matches = TreeMatch.matchTrees(rev1, rev2)
    val script = TreeMatch.editScript(rev1, rev2, matches)
    val ops = script.as[(Long, String, Option[Long], Option[Long])].collect().map {
      case (_, op, ak, bk) =>
        (op, ak.map(nameOf(rev1, _)).getOrElse(""), bk.map(nameOf(rev2, _)).getOrElse(""))
    }.toSeq.sorted
    val golden = Seq(
      ("delete", "archive", ""),
      ("insert", "", "lamp"),
      ("move", "box", "box"),
      ("update", "1965", "1966"),
      ("update", "shelf", "bookcase")).sorted
    assert(ops == golden, s"script was $ops")
  }

  test("rename does not cascade: children of the renamed element stay put") {
    val matches = TreeMatch.matchTrees(rev1, rev2)
    val script = TreeMatch.editScript(rev1, rev2, matches)
    // the two <book> subtrees live under shelf→bookcase; a rename of the
    // parent must produce neither move nor update rows for them
    val bookKeys = rev1.filter($"name" === "book")
      .select("node_key").as[Long].collect().toSet
    assert(script.filter($"a_key".isin(bookKeys.toSeq: _*)).count() == 0)
  }

  /** Keyed trees: the same logical change expressed as node tables with
    * STABLE node keys, diffed two ways. Where keys exist, the keyless
    * FMSE match must recover the identical classification. */
  private def keyedTrees = {
    val a = Seq(
      (1L, 1L, Option.empty[Long], "element", Option("library"), Option.empty[String], Seq(1)),
      (1L, 2L, Option(1L), "element", Option("shelf"), Option.empty[String], Seq(1, 1)),
      (1L, 3L, Option(2L), "element", Option("book"), Option.empty[String], Seq(1, 1, 1)),
      (1L, 4L, Option(3L), "text", Option.empty[String], Option("Dune"), Seq(1, 1, 1, 1)),
      (1L, 5L, Option(2L), "element", Option("book"), Option.empty[String], Seq(1, 1, 2)),
      (1L, 6L, Option(5L), "text", Option.empty[String], Option("Emma"), Seq(1, 1, 2, 1)),
      (1L, 7L, Option(1L), "element", Option("archive"), Option.empty[String], Seq(1, 2)),
      (1L, 8L, Option(7L), "text", Option.empty[String], Option("papers"), Seq(1, 2, 1))
    ).toDF("doc_id", "node_key", "parent_key", "kind", "name", "value", "ordpath")
    val b = Seq(
      (1L, 1L, Option.empty[Long], "element", Option("library"), Option.empty[String], Seq(1)),
      (1L, 2L, Option(1L), "element", Option("shelf"), Option.empty[String], Seq(1, 1)),
      (1L, 3L, Option(2L), "element", Option("book"), Option.empty[String], Seq(1, 1, 1)),
      (1L, 4L, Option(3L), "text", Option.empty[String], Option("Dune2"), Seq(1, 1, 1, 1)),
      (1L, 5L, Option(2L), "element", Option("book"), Option.empty[String], Seq(1, 1, 2)),
      (1L, 6L, Option(5L), "text", Option.empty[String], Option("Emma"), Seq(1, 1, 2, 1)),
      (1L, 9L, Option(1L), "element", Option("lamp"), Option.empty[String], Seq(1, 2))
    ).toDF("doc_id", "node_key", "parent_key", "kind", "name", "value", "ordpath")
    (a, b)
  }

  test("keyless FMSE agrees with the keyed Diff where keys exist") {
    val (a, b) = keyedTrees
    val keyed = Diff.diff(a, b, Seq("node_key"), Seq("kind", "name", "value"))
      .select($"node_key".as[Long], $"change_type".as[String]).collect()
    assert(keyed.filter(_._2 == "insert").map(_._1).toSet == Set(9L))
    assert(keyed.filter(_._2 == "delete").map(_._1).toSet == Set(7L, 8L))
    assert(keyed.filter(_._2 == "update").map(_._1).toSet == Set(4L))

    val matches = TreeMatch.matchTrees(a, b)
    // the keyless match recovers the true identity on every pair
    assert(matches.filter($"a_key" =!= $"b_key").count() == 0)
    val script = TreeMatch.editScript(a, b, matches)
    val fmse = script.select($"op".as[String],
      $"a_key".as[Option[Long]], $"b_key".as[Option[Long]]).collect()
    assert(fmse.filter(_._1 == "insert").flatMap(_._3).toSet == Set(9L))
    assert(fmse.filter(_._1 == "delete").flatMap(_._2).toSet == Set(7L, 8L))
    assert(fmse.filter(_._1 == "update").flatMap(_._2).toSet == Set(4L))
    assert(!fmse.exists(_._1 == "move"))
  }
}
