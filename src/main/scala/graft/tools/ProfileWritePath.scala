package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Break down TemporalTable.write's cost on the bench fixture (sf0.1
  * lineitem + surrogate key): raw parquet vs write() with each sidecar
  * toggled, so the fixed per-commit overhead is attributable. */
object ProfileWritePath {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.df(spark, sfDir, "lineitem")
      .withColumn("node_key", monotonically_increasing_id()).cache()
    li.count()
    def timed(what: String)(f: String => Unit): Unit = {
      // warmup on a fresh dir, then 2 timed fresh dirs, min
      def run(): Double = {
        val d = java.nio.file.Files.createTempDirectory("pw").resolve("t").toString
        val t0 = System.nanoTime(); f(d); (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = Seq(run(), run()).min
      println(f"$what%-34s $best%6.2f s")
    }
    timed("raw parquet write")(d => li.write.parquet(d))
    timed("write(no manifest, no keys)")(d =>
      graft.sources.TemporalTable.write(li, d, withManifest = false, withKeyIndex = false))
    timed("write(manifest only)")(d =>
      graft.sources.TemporalTable.write(li, d, withKeyIndex = false))
    timed("write(keys only)")(d =>
      graft.sources.TemporalTable.write(li, d, withManifest = false))
    timed("write(default: manifest+keys)")(d =>
      graft.sources.TemporalTable.write(li, d))
    spark.stop()
  }
}
