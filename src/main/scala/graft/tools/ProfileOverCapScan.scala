package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Over-cap index-scan posture probe: a 2.5M-member document (hundreds
  * of MB of JSON) with the driver-walk cap forced to 1 byte, so EVERY
  * scan must prove member-locality and serve purely distributed — the
  * document never touches the driver after the store. Times the CAS
  * point/range and concrete PATH scans (the member-local families) and
  * verifies the skeleton-needing families fail loudly rather than
  * collecting. The 100 TB posture this pins: index scans over shredded
  * corpora stream from the member tables (reference
  * function/jn/index/scan/ScanPathIndex.java:35 — its scans never
  * materialize the document either). */
object ProfileOverCapScan {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2500000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val members = spark.range(n.toLong).select(col("id").as("v"),
      concat(lit("xxxxxxxxxxxxxxxxxxxx-"), col("id")).as("pad"))
    val docJson = "{\"items\": [" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("pad"))))
      .as[String].collect().mkString(",") + "]}"
    println(f"doc bytes: ${docJson.length / 1e6}%.1f MB ($n members)")

    val st = new graft.query.JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("overcap-store").toString)
    val (_, storeSec) = timed(st.store("c", "big.jn", docJson))
    require(st.isShredded("c", "big.jn"), "document must shred")
    println(f"store: $storeSec%.1fs")

    sys.props("graft.scan.maxDriverBytes") = "1"
    try {
      def q(s: String): String = graft.query.JsoniqRun.serialize(st, s)
      val shapes = Seq(
        "cas_point" ->
          s"count(jn:scan-cas-index(jn:doc('c','big.jn'), 0, ${n - 10}, '>', '/items/[]/v'))",
        "cas_range" ->
          s"count(jn:scan-cas-index-range(jn:doc('c','big.jn'), 0, 100, ${n - 1}, true(), false(), '/items/[]/v'))",
        "path_concrete" ->
          "count(jn:scan-path-index(jn:doc('c','big.jn'), 0, '/items/[]/v'))")
      shapes.foreach { case (name, s) =>
        q(s) // warmup
        val (out, sec) = timed(q(s))
        println(f"overcap $name%-14s -> $out%-10s $sec%6.2fs")
      }
      // the skeleton-needing families stay loud
      Seq(
        "count(jn:scan-path-index(jn:doc('c','big.jn'), 0, '/items/[]'))",
        "count(jn:scan-path-index(jn:doc('c','big.jn'), 0, '//v'))",
        "count(jn:scan-name-index(jn:doc('c','big.jn'), 0, 'v'))")
        .foreach { s =>
          val loud =
            try { q(s); false }
            catch { case _: Exception => true }
          require(loud, s"expected loud cap failure: $s")
        }
      println("skeleton-needing families fail loudly: OK")
    } finally {
      sys.props.remove("graft.scan.maxDriverBytes")
      spark.stop()
    }
  }
}
