package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure string group-by vs hashed-surrogate group-by at 100M rows
  * (the only >2x-of-DuckDB shapes in BENCH_NOTES.md). */
object ProfileHashedAgg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/tmp/graftbench/d100000000")
    def time(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-28s ${runs.min}%8.1f ms")
    }
    time("groupBy(dept) string") {
      df.groupBy("dept").count().write.format("noop").mode("overwrite").save()
    }
    time("groupBy(xxhash64(dept))") {
      df.groupBy(xxhash64(col("dept")).as("k")).count()
        .write.format("noop").mode("overwrite").save()
    }
    time("hashed + decode join") {
      val agg = df.groupBy(xxhash64(col("dept")).as("k")).count()
      val dict = df.select("dept").distinct()
        .withColumn("k", xxhash64(col("dept")))
      agg.join(broadcast(dict), "k").select("dept", "count")
        .write.format("noop").mode("overwrite").save()
    }
    time("groupBy(dept,city) string") {
      df.groupBy("dept", "city").count().write.format("noop").mode("overwrite").save()
    }
    time("groupBy(xxhash64(d,c))") {
      df.groupBy(xxhash64(col("dept"), col("city")).as("k")).count()
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
