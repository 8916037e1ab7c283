package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Valid-time stab at volume: 10M intervals on a day-granular year axis,
  * fork-indexed vs plain parquet with min/max skipping — the measured
  * backing for the RI-tree sidecar's 100 TB posture (stab cost should
  * track the root-path partition count, not the table size). Prints
  * seconds and the files each plan actually read. */
object ProfileValidTime {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dayMs = 86400000L
    // intervals: starts spread over a year, lengths 1..30 days, 1% open
    val iv = spark.range(n).select(
      col("id").as("node_key"),
      (pmod(xxhash64(col("id")), lit(3650)) * dayMs).as("vf"))
      .withColumn("vt",
        when(pmod(xxhash64(col("node_key"), lit(1)), lit(100)) === 0,
          lit(null).cast("long"))
          .otherwise(col("vf") + (pmod(xxhash64(col("node_key"), lit(2)),
            lit(30)) + 1) * dayMs))

    val base = java.nio.file.Files.createTempDirectory("graft-vtprof")
    val plainDir = base.resolve("plain").toString
    val forkDir = base.resolve("fork").toString
    iv.repartition(64).write.parquet(plainDir)
    graft.operators.Intervals.writeIndexed(
      iv.repartition(64), forkDir, "vf", "vt", granularity = dayMs)

    val ts = 1800L * dayMs + 1
    def timed(label: String)(body: => (Long, Long)): Unit = {
      body // warmup
      val t0 = System.nanoTime()
      val (rows, files) = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $sec%7.3f s  rows=$rows%-9d files=$files")
    }

    // frames built once (the serving shape: a table handle is long-lived;
    // partition discovery amortizes across queries)
    val plain = spark.read.parquet(plainDir)
      .filter(col("vf") <= ts && (col("vt").isNull || col("vt") > ts))
    val idx = graft.operators.Intervals.readIndexed(spark, forkDir)
    val meta = idx.schema(graft.operators.Intervals.ForkCol).metadata
    val gran = meta.getLong(graft.operators.Intervals.MetaGranularity)
    val axisMax = meta.getLong(graft.operators.Intervals.MetaAxisMax)
    val nodes = graft.operators.Intervals.stabNodes(ts, gran)
      .filter(_ <= axisMax)
    val fork = idx.filter(
      col(graft.operators.Intervals.ForkPartCol).isin(nodes: _*) &&
        col(graft.operators.Intervals.ForkCol).isin(nodes: _*) &&
        col("vf") <= ts && (col("vt").isNull || col("vt") > ts))

    timed("stab_plain_minmax") {
      (plain.count(), plain.select(input_file_name()).distinct().count())
    }
    timed("stab_fork_inlist") {
      (fork.count(), fork.select(input_file_name()).distinct().count())
    }
    // scanned volume — the number that matters when storage is remote:
    // rows the scan must MOVE before the stab predicate runs
    val plainScanned = spark.read.parquet(plainDir).count()
    val forkScanned = idx.filter(
      col(graft.operators.Intervals.ForkPartCol).isin(nodes: _*)).count()
    println(f"scanned rows: plain=$plainScanned%,d fork=$forkScanned%,d " +
      f"(${100.0 * forkScanned / plainScanned}%.1f%%)")
    spark.stop()
  }
}
