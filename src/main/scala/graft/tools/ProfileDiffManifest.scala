package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileDiffManifest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.df(spark, sfDir, "lineitem")
      .withColumn("node_key", monotonically_increasing_id()).cache()
    li.count()
    val dir = java.nio.file.Files.createTempDirectory("pdm").resolve("t").toString
    graft.sources.TemporalTable.write(li, dir)
    graft.sources.TemporalTable.write(
      li.withColumn("l_quantity",
        expr("CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 1 ELSE l_quantity END")), dir)
    graft.sources.TemporalTable.diff(spark, dir, 1, 2).count() // warmup
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.sources.TemporalTable.diff(spark, dir, 1, 2).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"diff adjacent x3: ${times.map(t => f"$t%.2f").mkString(", ")} (min ${times.min}%.2f)")
    spark.stop()
  }
}
