package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fresh-JVM probe for the member-local XQUF fast commit (r15): the
  * bench's `j_scale_update` statement (`replace json value of
  * ...items[0].v`) against the 1M-member object document, before/after
  * breakdown. The fast path must (a) take effect (sentinel row), (b)
  * commit in well under the collect-reparse path's ~3.7 s, and (c)
  * keep the updated-revision key serving in its r14 band. */
object ProbeMemberUpdate {
  def main(args: Array[String]): Unit = {
    if (args.contains("--debug"))
      sys.props("graft.memberpatch.debug") = "1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.Encoders
    val members = spark.range(1000000L).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val docJson = "[" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as(Encoders.STRING).collect().mkString(",") + "]"
    val objDoc = "{\"meta\": {\"rev\": 1}, \"items\": " + docJson + "}"
    val st = new graft.query.JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("probe-mlu").toString)
    st.store("c", "obj.jn", objDoc)
    graft.query.JsoniqRun.serialize(st,
      """let $d := jn:doc('c','obj.jn')
        |let $s := jn:create-cas-index($d, 'xs:double', '/items/[]/w')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    def t(l: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$l%-28s $s%6.2f s")
      s
    }
    val upd = t("replace (fast commit)") {
      graft.query.JsoniqRun.serialize(st,
        "replace json value of jn:doc('c','obj.jn').items[0].v with -1")
    }
    val head = st.headRevision("c", "obj.jn").get
    val fast = st.isMemberLocalCommit("c", "obj.jn", head)
    println(s"fast-path taken: $fast (head=$head)")
    require(fast, "bench statement did not fast-commit")
    require(graft.query.JsoniqRun.serialize(st,
      "jn:doc('c','obj.jn').items[0].v") == "-1")
    // the r14 nodekey_updated band: key service over the fast revision
    val qk = "count(distinct-values(for $n in " +
      "jn:scan-cas-index(jn:doc('c','obj.jn'), 0, '0.99', '>', " +
      "'/items/[]/w') return sdb:nodekey($n)))"
    graft.query.JsoniqRun.serialize(st, qk) // warmup (replay ctx)
    val keyU = (1 to 2).map { _ =>
      t("nodekey over fast revision") {
        require(graft.query.JsoniqRun.serialize(st, qk) != "0")
        val k0 = graft.query.JsoniqRun.serialize(st,
          "sdb:nodekey(jn:doc('c','obj.jn').items[500000].v)")
        require(graft.query.JsoniqRun.serialize(st,
          s"jn:select-json-item(jn:doc('c','obj.jn'), $k0)").nonEmpty)
      }
    }.min
    val upd2 = t("second replace (chain)") {
      graft.query.JsoniqRun.serialize(st,
        "replace json value of jn:doc('c','obj.jn').items[17].v with -2")
    }
    // member-LEVEL ops (r15b): append and delete shift positions —
    // committed via the overlay's run translation, still no collect
    val updApp = t("append member (runs)") {
      graft.query.JsoniqRun.serialize(st,
        """append json {"v": -5, "w": 0.5} into jn:doc('c','obj.jn').items""")
    }
    val updDel = t("delete member (runs)") {
      graft.query.JsoniqRun.serialize(st,
        "delete json jn:doc('c','obj.jn').items[12]")
    }
    require(st.isMemberLocalCommit("c", "obj.jn",
      st.headRevision("c", "obj.jn").get), "member-level op must fast-commit")
    require(graft.query.JsoniqRun.serialize(st,
      "count(jn:doc('c','obj.jn').items[])") == "1000000")
    println(f"""PROBE_MEMBER_UPDATE {"update":$upd%.3f,"update2":$upd2%.3f,"append":$updApp%.3f,"delete":$updDel%.3f,"nodekey_updated":$keyU%.3f}""")
    spark.stop()
  }
}
