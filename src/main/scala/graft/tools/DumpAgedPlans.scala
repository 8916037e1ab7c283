package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for the h_record_lookup optimization: the OLD read
  * shape (spark.read over one path per revision — distributed listing
  * job + partition inference + schema probe at plan time) vs the NEW
  * recordRevisions plan (MetaIO-listed explicit FileIndex). Writes
  * plans/r16/h_record_lookup_{before,after}.txt. */
object DumpAgedPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nRevs = 1000
    val keysPer = 200
    val dir = java.nio.file.Files.createTempDirectory("aged-plans")
      .resolve("tbl").toString
    val rows = spark.range(1, nRevs + 1).select(col("id").cast("int").as("rev"))
      .crossJoin(spark.range(0, keysPer).toDF("node_key"))
      .withColumn("payload", xxhash64(col("node_key"), col("rev")))
    rows.repartition(32, col("rev")).write.partitionBy("rev").parquet(dir)
    rows.select(col("rev"), col("node_key"))
      .repartition(32, col("rev"))
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
    val kiDir = graft.sources.TemporalTable.keyIndexDir(dir)
    val paths = (1 to nRevs).map(r => s"$kiDir/rev=$r")
    def dump(name: String, plan: String): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r16/$name"), plan.getBytes("UTF-8"))
      println(s"wrote plans/r16/$name")
    }
    // BEFORE: the r15 read shape (one root path per revision sidecar)
    val before = spark.read.option("basePath", kiDir).parquet(paths: _*)
      .filter(col("node_key") === 7L)
      .select(col("rev").cast("int").as("revision"))
    dump("h_record_lookup_before.txt",
      "// r15 shape: spark.read over 1000 per-revision sidecar paths\n" +
        "// (resolution pays a distributed listing job + partition\n" +
        "// inference + footer schema probe at EVERY plan)\n" +
        before.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    val after = graft.sources.TemporalTable.recordRevisions(spark, dir, 7L)
    dump("h_record_lookup_after.txt",
      "// r16 shape: recordRevisions with the MetaIO-listed explicit\n" +
        "// FileIndex (no listing job, no partition inference, one\n" +
        "// footer probe)\n" +
        after.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
