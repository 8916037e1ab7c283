package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Per-query wall times for the XMark replay set — the front end's
  * decorrelation feedback loop. Args: query names (default: the
  * formerly-slow correlated set). `SPARK_GRAFT_XMARK_EXPLAIN=1` prints
  * each plan instead of running it twice. */
object ProfileXmark {
  def main(args: Array[String]): Unit = {
    val xmarkDir =
      "/root/reference/bundles/sirix-query/src/test/resources/xmark"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q08", "q11", "q12", "q20")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val xml = new String(
      Files.readAllBytes(Paths.get(s"$xmarkDir/auction.xml")), "UTF-8")
    val store = new graft.query.JsoniqRun.Store(spark,
      Files.createTempDirectory("graft-xmark-prof").toString)
    val t0 = System.nanoTime()
    val ctx = store.storeXml("xmark", "auction.xml", xml)
    println(f"store+encode: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    names.foreach { name =>
      val q = new String(Files.readAllBytes(
        Paths.get(s"$xmarkDir/queries/orig/$name.xq")), "UTF-8")
      if (sys.env.contains("SPARK_GRAFT_XMARK_EXPLAIN")) {
        graft.query.JsoniqRun.run(store, q, Some(ctx)).explain("formatted")
      } else {
        val times = (1 to 2).map { _ =>
          val t1 = System.nanoTime()
          val n = graft.query.JsoniqRun.run(store, q, Some(ctx)).count()
          ((System.nanoTime() - t1) / 1e9, n)
        }
        println(f"$name: ${times.map(_._1).min}%.2f s  " +
          f"(first ${times.head._1}%.2f) rows=${times.head._2}")
      }
    }
    spark.stop()
  }
}
