package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the write-cost components of the bucket-clustered layout in
  * one JVM: plain parquet write vs +bucket column vs +column+local sort.
  * Also sizes the resulting files (the sorted-by-hash layout randomizes
  * row order, which can hurt every other column's encoding). */
object ProfileBucketLayoutCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.df(spark, sfDir, "lineitem")
      .withColumn("node_key", monotonically_increasing_id()).cache()
    li.count()
    def dirSize(d: String): Long =
      graft.sources.MetaIO.listFiles(d).map(_._2).sum
    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var size = 0L
      val ts = (1 to 4).map { _ =>
        val d = java.nio.file.Files.createTempDirectory("pblc").resolve("t").toString
        val t0 = System.nanoTime()
        mk.write.parquet(d)
        val dt = (System.nanoTime() - t0) / 1e9
        size = dirSize(d)
        dt
      }
      println(f"[pblc] $label: ${ts.drop(1).map(t => f"$t%.2f").mkString(", ")} " +
        f"(min ${ts.drop(1).min}%.2f) bytes=$size")
    }
    val bucketed = li.withColumn("__graft_bucket",
      graft.operators.Diff.bucketExpr(Seq("node_key"), 65536))
    timed("plain")(li)
    timed("bucket column")(bucketed)
    timed("bucket column + local sort")(
      bucketed.sortWithinPartitions("__graft_bucket"))
    timed("plain (again)")(li)
    spark.stop()
  }
}
