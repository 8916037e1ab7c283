package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Breakdown probe for the bench's j_scale_nodekey_updated entry:
  * which of the three calls (scan-hit nodekey count, static-pointer
  * nodekey, select-item inverse) carries the time over the
  * update-derived 1M-member revision, and how it compares per call to
  * the pristine revision's nodekey serving. */
object ProbeUpdatedNodeKey {
  def main(args: Array[String]): Unit = {
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
      java.nio.file.Files.createTempDirectory("probe-unk").toString)
    st.store("c", "obj.jn", objDoc)
    graft.query.JsoniqRun.serialize(st,
      """let $d := jn:doc('c','obj.jn')
        |let $s := jn:create-cas-index($d, 'xs:double', '/items/[]/w')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    val qk = "count(distinct-values(for $n in " +
      "jn:scan-cas-index(jn:doc('c','obj.jn'), 0, '0.99', '>', " +
      "'/items/[]/w') return sdb:nodekey($n)))"
    def t(l: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$l%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def run(q: String): Unit =
      require(graft.query.JsoniqRun.serialize(st, q).nonEmpty)
    run(qk) // warmup
    t("pristine qk")(run(qk))
    t("pristine qk 2")(run(qk))
    val kp = graft.query.JsoniqRun.serialize(st,
      "sdb:nodekey(jn:doc('c','obj.jn').items[500000].v)")
    t("pristine select-item")(run(
      s"jn:select-json-item(jn:doc('c','obj.jn'), $kp)"))
    t("pristine select-item 2")(run(
      s"jn:select-json-item(jn:doc('c','obj.jn'), $kp)"))
    t("pristine nav only")(run(
      "jn:doc('c','obj.jn').items[500000].v"))
    t("update (replace one v)")(graft.query.JsoniqRun.serialize(st,
      "replace json value of jn:doc('c','obj.jn').items[0].v with -1"))
    t("updated qk warm")(run(qk))
    t("updated qk")(run(qk))
    t("updated qk 2")(run(qk))
    t("updated static nodekey")(run(
      "sdb:nodekey(jn:doc('c','obj.jn').items[500000].v)"))
    t("updated static nodekey 2")(run(
      "sdb:nodekey(jn:doc('c','obj.jn').items[500000].v)"))
    val k0 = graft.query.JsoniqRun.serialize(st,
      "sdb:nodekey(jn:doc('c','obj.jn').items[500000].v)")
    t("updated select-item")(run(
      s"jn:select-json-item(jn:doc('c','obj.jn'), $k0)"))
    t("updated select-item 2")(run(
      s"jn:select-json-item(jn:doc('c','obj.jn'), $k0)"))
    t("updated nav only")(run(
      "jn:doc('c','obj.jn').items[500000].v"))
    spark.stop()
  }
}
