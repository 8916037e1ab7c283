package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of the three bench store shapes (`j_scale_store`,
  * `j_scale_obj_store`, `j_scale_xml_store`): the doc-row commit, the
  * driver split/encode scans, and the member-table writes timed
  * separately, so optimization targets the phase that actually costs
  * (spark_optimization_guide §1 "measure first"). Lives in
  * `graft.query` to reach the store's package-private pieces; run via
  * `sbt "runMain graft.query.ProfileStorePhases"`. */
object ProfileStorePhases {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.Encoders
    import spark.implicits._
    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-38s $s%7.3f s")
      s
    }
    val members = spark.range(1000000L).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val docJson = "[" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as(Encoders.STRING).collect().mkString(",") + "]"
    val objDoc = "{\"meta\": {\"rev\": 1}, \"items\": " + docJson + "}"
    val xb = new StringBuilder(400000 * 70)
    xb.append("<site><people>")
    var xi = 0
    while (xi < 400000) {
      xb.append("<person><name>p").append(xi).append("</name><age>")
        .append(18 + xi % 60).append("</age></person>")
      xi += 1
    }
    xb.append("</people></site>")
    val xml = xb.toString
    val base = java.nio.file.Files.createTempDirectory("profile-store").toString
    val st = new JsoniqRun.Store(spark, base)

    (1 to 2).foreach { round =>
      println(s"--- round $round (doc ${docJson.length / 1048576} MB json, " +
        s"${xml.length / 1048576} MB xml) ---")
      println("[json root-array]")
      timed("split spans (driver)") {
        JsoniqRun.Store.splitTopLevelArraySpans(docJson); ()
      }
      timed("doc-row TemporalTable.write") {
        graft.sources.TemporalTable.write(
          Seq(docJson).toDF("doc_json"), s"$base/t/r$round"); ()
      }
      val spans = JsoniqRun.Store.splitTopLevelArraySpans(docJson)
      timed("writeMembers (typed json)") {
        st.writeMembers(s"$base/m/r$round",
          JsoniqRun.Store.MemberSpans(docJson, spans), "json")
      }
      timed("full store()") { st.store("c", s"w$round.jn", docJson) }

      println("[json object-rooted]")
      timed("shredCandidates (driver)") {
        JsoniqRun.Store.shredCandidates(objDoc); ()
      }
      timed("full store()") { st.store("c", s"o$round.jn", objDoc) }

      println("[xml]")
      var enc: (String, Seq[XmlItem.ListSpan]) = null
      timed("xmlToJsonSpans (driver encode)") {
        enc = XmlItem.xmlToJsonSpans(xml, JsoniqRun.Store.ShredMinBytes)
      }
      val sel = enc._2.groupBy(_.steps).collect { case (_, Seq(one)) => one }
        .toSeq.sortBy((sp: XmlItem.ListSpan) => sp.start - sp.end).take(12)
      timed("doc-row TemporalTable.write (xml json)") {
        graft.sources.TemporalTable.write(
          Seq(enc._1).toDF("doc_json"), s"$base/tx/r$round"); ()
      }
      sel.zipWithIndex.foreach { case (span, k) =>
        timed(s"writeXmlMembers s$k (${span.members.size} members)") {
          st.writeXmlMembers(s"$base/xm/r$round/s$k",
            JsoniqRun.Store.MemberSpans(enc._1, span.members.toArray))
        }
      }
      timed("full storeXml()") { st.storeXml("c", s"a$round.xml", xml); () }
    }
    spark.stop()
  }
}
