package graft.query

import graft.SparkSpec

/** Distributed node identity over UPDATE-DERIVED shredded revisions
  * ([[JsoniqRun]]'s replayShredKeys): after `replace/insert/delete/
  * append/rename json`, `sdb:nodekey` and `jn:select-json-item` keep
  * serving through the base revision's offsets layout + a driver-held
  * patch set — byte-for-byte the keys the driver-tree replay assigns.
  * Ground truth is a PLAIN (unshredded) store receiving the SAME
  * update statements; the differential runs after EVERY statement. */
class UpdateShredKeySpec extends SparkSpec {

  private def mkStore(tag: String): JsoniqRun.Store =
    new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory(s"graft-ushred-$tag").toString)

  private val doc = """{"meta": {"name": "corpus", "v": 1}, "items": [""" +
    (1 to 30).map(i => s"""{"v": $i, "w": {"x": ${i % 3}}}""")
      .mkString(",") +
    """], "mid": true, "tags": [""" +
    (1 to 20).map(i => s""""t$i"""").mkString(",") + """], "tail": 9}"""

  // one revision per statement; shapes cover every replay arm:
  // intra-member same-kind primitive / kind-change / deep insert,
  // member-root replace (re-mint), member delete / insert / append,
  // skeleton replace / insert / delete / rename, chain-array rename
  private val updates = Seq(
    """replace json value of jn:doc('c','d').items[3].v with 999""",
    """replace json value of jn:doc('c','d').items[5] with {"v": -1, "w": {"x": 0}}""",
    """delete json jn:doc('c','d').items[7]""",
    """insert json {"v": 0, "w": {"x": 9}} into jn:doc('c','d').items at position 2""",
    """append json {"v": 1000, "w": {"x": 1}} into jn:doc('c','d').items""",
    """insert json {"y": [7, 8]} into jn:doc('c','d').items[4].w""",
    """replace json value of jn:doc('c','d').meta.name with "renamed"""",
    """insert json {"extra": {"deep": [1, 2]}} into jn:doc('c','d')""",
    """delete json jn:doc('c','d').mid""",
    """rename json jn:doc('c','d').tail as "tail2"""",
    """replace json value of jn:doc('c','d').tags[2] with 42""",
    """rename json jn:doc('c','d').tags as "labels"""")

  private val probes = Seq(
    "sdb:nodekey(jn:doc('c','d'))",
    "sdb:nodekey(jn:doc('c','d').meta)",
    "sdb:nodekey(jn:doc('c','d').meta.name)",
    "sdb:nodekey(jn:doc('c','d').items)",
    "sdb:nodekey(jn:doc('c','d').items[0])",
    "sdb:nodekey(jn:doc('c','d').items[2])",
    "sdb:nodekey(jn:doc('c','d').items[3].v)",
    "sdb:nodekey(jn:doc('c','d').items[5])",
    "sdb:nodekey(jn:doc('c','d').items[5].w)",
    "sdb:nodekey(jn:doc('c','d').items[8].w.x)",
    "for $i in jn:doc('c','d').items[] return sdb:nodekey($i)",
    "for $i in jn:doc('c','d').items[] return sdb:nodekey($i.v)")

  private def crossCheckKeys(shredded: JsoniqRun.Store,
                             plain: JsoniqRun.Store,
                             after: String): Unit =
    probes.foreach { q =>
      val want = scala.util.Try(JsoniqRun.serialize(plain, q))
      val got = scala.util.Try(JsoniqRun.serialize(shredded, q))
      (want, got) match {
        case (scala.util.Success(w), scala.util.Success(g)) =>
          assert(g === w, s"\nafter: $after\nquery: $q")
        case (scala.util.Failure(_), scala.util.Failure(_)) => ()
        case (w, g) => fail(
          s"\nafter: $after\nquery: $q\nplain: $w\nshredded: $g")
      }
    }

  test("update-derived revisions keep serving node keys distributed") {
    val plain = mkStore("plain")
    plain.store("c", "d", doc)
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val st = mkStore("shred")
      st.store("c", "d", doc)
      assert(st.shredEntries("c", "d", None).count(_.kind == "json") == 2)
      crossCheckKeys(st, plain, "initial store")
      updates.foreach { u =>
        JsoniqRun.serialize(plain, u)
        JsoniqRun.serialize(st, u)
        crossCheckKeys(st, plain, u)
      }
      // the final revision still has every statement's edit log
      assert(st.hasEditChain("c", "d",
        graft.sources.TemporalTable.mostRecentRevision(
          st.docPath("c", "d")).get))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("select-item inverts updated keys (retained, re-minted, dead)") {
    val plain = mkStore("plain2")
    plain.store("c", "d", doc)
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val st = mkStore("shred2")
      st.store("c", "d", doc)
      val truth0 = NodeKeys.build(doc)
      val deadKey = truth0.lookup(List(Left("items"), Right(7)))
        .map(_.key).get
      val keptKey = truth0.lookup(List(Left("items"), Right(9), Left("w"),
        Left("x"))).map(_.key).get
      Seq(
        """replace json value of jn:doc('c','d').items[5] with {"q": 1}""",
        """delete json jn:doc('c','d').items[7]""",
        """append json {"v": -5} into jn:doc('c','d').items"""
      ).foreach { u =>
        JsoniqRun.serialize(plain, u)
        JsoniqRun.serialize(st, u)
      }
      // a retained member key inverts identically on both stores
      assert(JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), $keptKey)") ===
        JsoniqRun.serialize(plain,
          s"jn:select-json-item(jn:doc('c','d'), $keptKey)"))
      // the re-minted member and the appended member carry FRESH keys
      val freshQ = "sdb:nodekey(jn:doc('c','d').items[5])"
      val freshKey = JsoniqRun.serialize(st, freshQ)
      assert(freshKey === JsoniqRun.serialize(plain, freshQ))
      assert(freshKey.toLong > truth0.maxKey)
      assert(JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), $freshKey)") === """{"q":1}""")
      // the deleted member's key is DEAD on both stores
      intercept[IllegalArgumentException](JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), $deadKey)"))
      intercept[IllegalArgumentException](JsoniqRun.serialize(plain,
        s"jn:select-json-item(jn:doc('c','d'), $deadKey)"))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("entry-dropping and chain-renaming edits replay correctly") {
    // nested chain (wrap -> items) so ancestor edits can kill it, plus
    // a top-level chain the rename moves
    val doc2 = """{"wrap": {"items": [""" +
      (1 to 20).map(i => s"""{"v": $i}""").mkString(",") +
      """], "pad": 1}, "tags": [""" +
      (1 to 20).map(i => s""""t$i"""").mkString(",") + """], "tail": 9}"""
    val plain = mkStore("plain3")
    plain.store("c", "d", doc2)
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val st = mkStore("shred3")
      st.store("c", "d", doc2)
      assert(st.shredEntries("c", "d", None).count(_.kind == "json") == 2)
      val updates2 = Seq(
        // rename the CHAIN array itself: later paths address .labels
        """rename json jn:doc('c','d').tags as "labels"""",
        // replace the whole elided array with a literal: entry drop,
        // fresh skeleton mint
        """replace json value of jn:doc('c','d').labels with [1, 2]""",
        // ancestor replace kills the nested chain wholesale
        """replace json value of jn:doc('c','d').wrap with {"n": 3}""",
        // and fresh skeleton content keeps minting consistently
        """insert json {"meta2": {"q": [7, 8]}} into jn:doc('c','d')""")
      val probes2 = Seq(
        "sdb:nodekey(jn:doc('c','d'))",
        "sdb:nodekey(jn:doc('c','d').tail)",
        "sdb:nodekey(jn:doc('c','d').labels)",
        "sdb:nodekey(jn:doc('c','d').labels[1])",
        "sdb:nodekey(jn:doc('c','d').wrap)",
        "sdb:nodekey(jn:doc('c','d').wrap.n)",
        "sdb:nodekey(jn:doc('c','d').wrap.items[3])",
        "sdb:nodekey(jn:doc('c','d').meta2.q[0])")
      updates2.foreach { u =>
        JsoniqRun.serialize(plain, u)
        JsoniqRun.serialize(st, u)
        probes2.foreach { q =>
          val want = scala.util.Try(JsoniqRun.serialize(plain, q))
          val got = scala.util.Try(JsoniqRun.serialize(st, q))
          (want, got) match {
            case (scala.util.Success(w), scala.util.Success(g)) =>
              assert(g === w, s"\nafter: $u\nquery: $q")
            case (scala.util.Failure(_), scala.util.Failure(_)) => ()
            case (w, g) => fail(
              s"\nafter: $u\nquery: $q\nplain: $w\nshredded: $g")
          }
        }
      }
      // the dead chains' keys are gone on both stores
      val k = NodeKeys.build(doc2)
        .lookup(List(Left("wrap"), Left("items"), Right(5))).map(_.key).get
      intercept[IllegalArgumentException](JsoniqRun.serialize(st,
        s"jn:select-json-item(jn:doc('c','d'), $k)"))
      intercept[IllegalArgumentException](JsoniqRun.serialize(plain,
        s"jn:select-json-item(jn:doc('c','d'), $k)"))
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }

  test("the replayed layout serves with the driver-tree path fenced off") {
    // cap small enough that ANY driver-tree build of the document
    // fails loudly, but big enough for the replay's patch bytes: a
    // passing probe PROVES the distributed arm served it
    val prevShred = sys.props.get("graft.shred.min")
    val prevCap = sys.props.get("graft.nodekeys.maxDriverBytes")
    sys.props("graft.shred.min") = "1"
    try {
      val st = mkStore("fenced")
      st.store("c", "d", doc)
      val truth0 = NodeKeys.build(doc)
      JsoniqRun.serialize(st,
        """replace json value of jn:doc('c','d').items[3].v with 999""")
      JsoniqRun.serialize(st,
        """delete json jn:doc('c','d').items[0]""")
      sys.props("graft.nodekeys.maxDriverBytes") = "600"
      // items[3] slid to items[2]; its key (and its v's key) held
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:doc('c','d').items[2].v)") ===
        truth0.lookup(List(Left("items"), Right(3), Left("v")))
          .map(_.key).get.toString)
      // untouched late member: pure run translation
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:doc('c','d').items[28])") ===
        truth0.lookup(List(Left("items"), Right(29))).map(_.key).get.toString)
      // skeleton node
      assert(JsoniqRun.serialize(st,
        "sdb:nodekey(jn:doc('c','d').tail)") ===
        truth0.lookup(List(Left("tail"))).map(_.key).get.toString)
    } finally {
      prevShred match {
        case Some(v) => sys.props("graft.shred.min") = v
        case None => sys.props.remove("graft.shred.min"); ()
      }
      prevCap match {
        case Some(v) => sys.props("graft.nodekeys.maxDriverBytes") = v
        case None => sys.props.remove("graft.nodekeys.maxDriverBytes"); ()
      }
    }
  }

  test("chain-overwriting root insert and rename keep key parity") {
    // r15: a ROOT-LEVEL object insert whose value carries a field named
    // like a shredded chain OVERWRITES that chain (applyAll's
    // object-insert semantics), and a rename whose NEW name lands on
    // another chain overwrites that one — both must invalidate the
    // stale layout instead of serving base-revision keys
    val plain = mkStore("plain5")
    plain.store("c", "d", doc)
    val prev = sys.props.get("graft.shred.min")
    sys.props("graft.shred.min") = "1"
    try {
      val st = mkStore("shred5")
      st.store("c", "d", doc)
      assert(st.shredEntries("c", "d", None).count(_.kind == "json") == 2)
      val collisions = Seq(
        """insert json {"items": [{"v": -7}, {"v": -8}]} into jn:doc('c','d')""",
        """rename json jn:doc('c','d').items as "tags"""")
      val probes5 = Seq(
        "jn:doc('c','d')",
        "sdb:nodekey(jn:doc('c','d'))",
        "sdb:nodekey(jn:doc('c','d').items)",
        "sdb:nodekey(jn:doc('c','d').items[0])",
        "sdb:nodekey(jn:doc('c','d').items[0].v)",
        "sdb:nodekey(jn:doc('c','d').items[1])",
        "sdb:nodekey(jn:doc('c','d').tags)",
        "sdb:nodekey(jn:doc('c','d').tags[0])",
        "sdb:nodekey(jn:doc('c','d').tags[1].v)",
        "sdb:nodekey(jn:doc('c','d').tail)")
      collisions.foreach { u =>
        JsoniqRun.serialize(plain, u)
        JsoniqRun.serialize(st, u)
        probes5.foreach { q =>
          val want = scala.util.Try(JsoniqRun.serialize(plain, q))
          val got = scala.util.Try(JsoniqRun.serialize(st, q))
          (want, got) match {
            case (scala.util.Success(w), scala.util.Success(g)) =>
              assert(g === w, s"\nafter: $u\nquery: $q")
            case (scala.util.Failure(_), scala.util.Failure(_)) => ()
            case (w, g) => fail(
              s"\nafter: $u\nquery: $q\nplain: $w\nshredded: $g")
          }
        }
      }
    } finally prev match {
      case Some(v) => sys.props("graft.shred.min") = v
      case None => sys.props.remove("graft.shred.min"); ()
    }
  }
}
