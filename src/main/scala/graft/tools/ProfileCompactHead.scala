package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mirrors the bench's w_compact_head shape (fragmented 32-file head,
  * bin-pack to ~4) to time compactHead in isolation — evidence harness
  * for the content-identical key-index sidecar copy. */
object ProfileCompactHead {
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
    val ts = (1 to 4).map { _ =>
      val dir = java.nio.file.Files.createTempDirectory("pch").resolve("t").toString
      graft.sources.TemporalTable.write(li, dir)
      graft.sources.TemporalTable.write(li.repartition(32), dir)
      val fragRev = graft.sources.TemporalTable.mostRecentRevision(dir).get
      val headBytes = graft.sources.MetaIO.listFiles(s"$dir/rev=$fragRev").map(_._2).sum
      val t0 = System.nanoTime()
      val compacted = graft.sources.TemporalTable.compactHead(
        spark, dir, targetFileBytes = math.max(1L, headBytes / 4))
      require(compacted.nonEmpty)
      val sec = (System.nanoTime() - t0) / 1e9
      // the copied sidecar must serve lookups identically
      val rev = compacted.get
      require(graft.sources.MetaIO.exists(
        s"${dir}/_keyindex/rev=$rev"), "key index sidecar missing")
      sec
    }
    println(f"[pch] compactHead: ${ts.map(t => f"$t%.2f").mkString(", ")} (min ${ts.min}%.2f)")
    spark.stop()
  }
}
