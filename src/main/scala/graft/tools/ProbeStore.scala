package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: root-array store wall time at the driver heap. */
object ProbeStore {
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
    val st = new graft.query.JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("probe").toString)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def t[A](l: String)(f: => A): A = {
      val g0 = gcMs(); val t0 = System.nanoTime(); val a = f
      println(f"$l%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"(gc ${(gcMs() - g0) / 1000.0}%5.2f s)")
      a
    }
    t("store warm")(st.store("c", "w.jn", docJson))
    t("store 2")(st.store("c", "w.jn", docJson))
    t("store 3")(st.store("c", "w.jn", docJson))
    // the object-rooted layout (field-chain shred): the r12 bench saw a
    // driver GC spike here at big heaps — the span-batched member write
    // must keep it flat across -Xmx settings
    val objDoc = "{\"meta\": {\"rev\": 1}, \"items\": " + docJson + "}"
    t("obj warm")(st.store("c", "o.jn", objDoc))
    t("obj 2")(st.store("c", "o.jn", objDoc))
    t("obj 3")(st.store("c", "o.jn", objDoc))
    println(s"heap: ${Runtime.getRuntime.maxMemory() / (1L << 20)} MB")
    spark.stop()
  }
}
