package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose `h_record_lookup` (recordRevisions over a 1000-revision
  * synthesized key index, pre-compaction): the commit-log parse, the
  * 1000-path parquet scan, and plan/action split — plus read variants
  * (explicit schema, no basePath) to attribute the fixed cost. */
object ProfileAgedLookup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpus = 32
    val nRevs = 1000
    val keysPer = 200
    val dir = java.nio.file.Files.createTempDirectory("profile-aged")
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
      val t0 = System.nanoTime(); f
      println(f"  $label%-52s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val kiDir = graft.sources.TemporalTable.keyIndexDir(dir)
    val paths = (1 to nRevs).map(r => s"$kiDir/rev=$r")
    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      timed("commits(path) parse") {
        graft.sources.TemporalTable.commits(dir); ()
      }
      timed("listDirs(keyIndexDir)") {
        graft.sources.MetaIO.listDirs(kiDir); ()
      }
      timed("plan: spark.read 1000 paths (basePath)") {
        spark.read.option("basePath", kiDir).parquet(paths: _*); ()
      }
      timed("scan+count: basePath read, filtered") {
        spark.read.option("basePath", kiDir).parquet(paths: _*)
          .filter(col("node_key") === 7L).count(); ()
      }
      timed("scan+count: explicit schema") {
        spark.read.schema("node_key BIGINT")
          .option("basePath", kiDir).parquet(paths: _*)
          .filter(col("node_key") === 7L).count(); ()
      }
      timed("recordRevisions full (count)") {
        graft.sources.TemporalTable.recordRevisions(spark, dir, 7L).count(); ()
      }
      timed("scan+count: driver-side listing (threshold 4096)") {
        spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", 4096)
        try spark.read.schema("node_key BIGINT")
          .option("basePath", kiDir).parquet(paths: _*)
          .filter(col("node_key") === 7L).count()
        finally spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", 32)
        ()
      }
      timed("scan+count: file paths + input_file_name rev") {
        val files = graft.sources.MetaIO.parallelMap(paths)(p =>
          graft.sources.MetaIO.listFiles(p).map(f => s"$p/${f._1}")
            .filter(_.endsWith(".parquet"))).flatten
        spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", 4096)
        try spark.read.schema("node_key BIGINT").parquet(files: _*)
          .filter(col("node_key") === 7L)
          .select(regexp_extract(input_file_name(), "rev=(\\d+)/", 1)
            .cast("int").as("revision"))
          .count()
        finally spark.conf.set(
          "spark.sql.sources.parallelPartitionDiscovery.threshold", 32)
        ()
      }
    }
    spark.stop()
  }
}
