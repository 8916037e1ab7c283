package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileWriteCold {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.df(spark, sfDir, "lineitem")
      .withColumn("node_key", monotonically_increasing_id()).cache()
    li.count()
    // mimic bench: first-ever TemporalTable.write in the session, timed cold
    val d1 = java.nio.file.Files.createTempDirectory("pwc").resolve("t").toString
    val t0 = System.nanoTime()
    graft.sources.TemporalTable.write(li, d1)
    println(f"cold write: ${(System.nanoTime()-t0)/1e9}%.2f s")
    val d2 = java.nio.file.Files.createTempDirectory("pwc").resolve("t").toString
    val t1 = System.nanoTime()
    graft.sources.TemporalTable.write(li, d2)
    println(f"warm write: ${(System.nanoTime()-t1)/1e9}%.2f s")
    val d3 = java.nio.file.Files.createTempDirectory("pwc").resolve("t").toString
    val t2 = System.nanoTime()
    graft.sources.TemporalTable.write(li, d3)
    println(f"warm write: ${(System.nanoTime()-t2)/1e9}%.2f s")
    spark.stop()
  }
}
