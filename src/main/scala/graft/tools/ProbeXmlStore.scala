package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: XMark-shaped XML store wall time. */
object ProbeXmlStore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    val st = new graft.query.JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("probe-xml").toString)
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$l%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      a
    }
    t("xml warm")(st.storeXml("c", "a.xml", xml))
    t("xml 2")(st.storeXml("c", "a.xml", xml))
    t("xml 3")(st.storeXml("c", "a.xml", xml))
    spark.stop()
  }
}
