package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 scale check for the GENERALIZED shred (object-rooted JSON
  * and stored XML): a >=50 MB object-rooted document and a scaled
  * XMark-shaped XML document, each queried through the textual front
  * end against the equivalent direct-DataFrame plan. The round's done
  * bar: front-end time within 2x of the direct plan. */
object ProfileShredShapes {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2500000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      a
    }

    // ---------- object-rooted JSON ----------
    val members = spark.range(n.toLong).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val pq = java.nio.file.Files.createTempDirectory("shredshape").toString
    members.write.mode("overwrite").parquet(s"$pq/members")
    val itemsJson = members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as[String].collect().mkString(",")
    val objDoc = s"""{"meta": {"name": "corpus", "rev": 7}, "items": [$itemsJson]}"""
    println(f"object-rooted doc: ${objDoc.length / 1e6}%.1f MB ($n items)")
    val st = new graft.query.JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("shredshape-store").toString)
    timed("store object-rooted (commit+shred)") {
      st.store("c", "obj.jn", objDoc)
    }
    val q1 = "count(jn:doc('c','obj.jn').items[][?$$.w gt 0.9])"
    graft.query.JsoniqRun.serialize(st, q1) // warmup
    val cnt1 = timed("jsoniq  .items[][?w gt 0.9]") {
      graft.query.JsoniqRun.serialize(st, q1)
    }
    val cnt1d = timed("direct  parquet filter+count") {
      spark.read.parquet(s"$pq/members")
        .filter(col("w") > 0.9).count().toString
    }
    require(cnt1 == cnt1d, s"object-rooted disagrees: $cnt1 vs $cnt1d")

    // ---------- distributed index scan over the shredded doc ----------
    // (round-12: jn:scan-* used to collect the WHOLE document to the
    // driver and walk it there; the shredded plan scans member tables
    // across executors with only the skeleton on the driver)
    graft.query.JsoniqRun.serialize(st,
      """let $d := jn:doc('c','obj.jn')
        |let $s := jn:create-cas-index($d, 'xs:double', '/items/[]/w')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    val qScan = "count(jn:scan-cas-index(jn:doc('c','obj.jn'), 0, '0.9', " +
      "'>', '/items/[]/w'))"
    graft.query.JsoniqRun.serialize(st, qScan) // warmup
    val cntS = timed("jsoniq  scan-cas-index w > '0.9'") {
      graft.query.JsoniqRun.serialize(st, qScan)
    }
    // equivalent direct plan: the same lexicographic comparison over
    // the member parquet (the scan compares index STRINGS)
    val cntSd = timed("direct  parquet string-cmp count") {
      spark.read.parquet(s"$pq/members")
        .filter(col("w").cast("string") > "0.9").count().toString
    }
    require(cntS == cntSd, s"scan disagrees: $cntS vs $cntSd")
    println(s"scan-cas-index hits: $cntS")

    // ---------- scaled XMark-shaped XML ----------
    val m = math.max(1, n / 3)
    val sb = new StringBuilder(m * 90)
    sb.append("<site><regions><africa/></regions><people>")
    var i = 0
    while (i < m) {
      sb.append("<person id=\"person").append(i).append("\"><name>p")
        .append(i).append("</name><age>").append(18 + i % 60)
        .append("</age></person>")
      i += 1
    }
    sb.append("</people></site>")
    val xml = sb.toString
    println(f"xml doc: ${xml.length / 1e6}%.1f MB ($m persons)")
    timed("store xml (commit+shred)") { st.storeXml("c", "a.xml", xml) }
    val q2 = "count(jn:doc('c','a.xml')/site/people/person)"
    graft.query.JsoniqRun.serialize(st, q2) // warmup
    val cnt2 = timed("jsoniq  /site/people/person count") {
      graft.query.JsoniqRun.serialize(st, q2)
    }
    require(cnt2 == m.toString, s"xml count: $cnt2 vs $m")
    // age filter through the element encoding vs a direct frame of the
    // same shredded members
    val q3 = "count(jn:doc('c','a.xml')/site/people/person[?xs:integer($$/age/text()) ge 60])"
    graft.query.JsoniqRun.serialize(st, q3) // warmup
    val cnt3 = timed("jsoniq  person[age>=60] count") {
      graft.query.JsoniqRun.serialize(st, q3)
    }
    val shredDir = s"${st.baseDir}/c/a.xml/_shred/r1"
    val meta = graft.sources.MetaIO.readString(s"$shredDir/_meta.json")
    println(s"xml shred manifest: $meta")
    val memberDf = spark.read.parquet(s"$shredDir/s0")
    // lower bound: a FIXED child-slot probe (knows age is child [1] —
    // cheaper than the name-addressed navigation the query performs)
    val cnt3d = timed("direct  fixed-slot filter+count") {
      memberDf.filter(
        variant_get(col("member"), "$['~c'][1]['~c'][0]", "string")
          .try_cast("int") >= 60).count().toString
    }
    // semantically equal direct plan: find the child ELEMENT NAMED age
    // (what the front-end step actually does)
    val cnt3e = timed("direct  name-addressed filter+count") {
      memberDf.filter(expr(
        "exists(try_cast(variant_get(member, '$[\\'~c\\']') as array<variant>), " +
          "x -> try_cast(variant_get(x, '$[\\'~n\\']') as string) = 'age' " +
          "and try_cast(variant_get(x, '$[\\'~c\\'][0]') as int) >= 60)"))
        .count().toString
    }
    require(cnt3 == cnt3d && cnt3 == cnt3e,
      s"xml filter disagrees: $cnt3 / $cnt3d / $cnt3e")
    println(s"front-end $cnt3 = fixed-slot $cnt3d = name-addressed $cnt3e")
    spark.stop()
  }
}
