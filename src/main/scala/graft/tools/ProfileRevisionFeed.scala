package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose `h_revision_feed` (ChangeFeed.revisionFeed over the bench's
  * synthesized 1000-revision aged table): the bare history scan vs the
  * windowed feed, plus the formatted plan for plans/r17. */
object ProfileRevisionFeed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpus = 32
    val nRevs = 1000
    val keysPer = 200
    val dir = java.nio.file.Files.createTempDirectory("profile-feed")
      .resolve("tbl").toString
    val rows = spark.range(1, nRevs + 1).select(col("id").cast("int").as("rev"))
      .crossJoin(spark.range(0, keysPer).toDF("node_key"))
      .withColumn("payload", xxhash64(col("node_key"),
        when(pmod(col("rev") - 1, lit(keysPer)) === col("node_key"), col("rev"))
          .otherwise(lit(0))))
    rows.repartition(cpus, col("rev")).write.partitionBy("rev").parquet(dir)
    rows.select(col("rev"), col("node_key"))
      .repartition(cpus, col("rev"))
      .write.partitionBy("rev").parquet(graft.sources.TemporalTable.keyIndexDir(dir))
    val base = System.currentTimeMillis() - nRevs
    val fileLists = graft.sources.MetaIO.parallelMap((1 to nRevs).toSeq) { r =>
      r -> graft.sources.MetaIO.listFiles(s"$dir/rev=$r")
        .map { case (n, s) => s"$n|$s" }.mkString(";")
    }.toMap
    (1 to nRevs).foreach { r =>
      graft.sources.MetaIO.createNew(s"$dir/_commits/${"%08d".format(r)}.json",
        s"""{"revision":$r,"commitTsMs":${base + r},"author":"bench",""" +
          s""""message":"","files":"${fileLists(r)}"}""")
    }
    def timed(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prf] $label: ${ts.map(t => f"$t%.2f").mkString(", ")} (min ${ts.min}%.2f)")
    }
    timed("history scan only (readAllRevisions count)") {
      graft.sources.TemporalTable.readAllRevisions(spark, dir).count(); ()
    }
    timed("revisionFeed count (h_revision_feed shape)") {
      graft.streaming.ChangeFeed.revisionFeed(spark, dir).count(); ()
    }
    println("===PLAN revisionFeed===")
    graft.streaming.ChangeFeed.revisionFeed(spark, dir).explain("formatted")
    spark.stop()
  }
}
