package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Experiment harness for the three >2×-of-DuckDB bench shapes
  * (BENCH_NOTES.md: groupByDept / groupByDeptCity / countDistinctDept —
  * all string-keyed aggregation). Runs each shape under candidate
  * configurations in separate sessions so codegen caches don't leak
  * between variants:
  *
  *  - default: the Bench configuration
  *  - vecmap: first-level VECTORIZED aggregate hash map
  *    (`spark.sql.codegen.aggregate.map.vectorized.enable` — off by
  *    default in Spark; column-batch layout for the hot first-level map)
  *  - intkey: integer-keyed equivalents of the same shapes (the
  *    DuckDB-dictionary-code analog, showing the key-type delta)
  */
object ProfileStringAgg {
  private val dir = "/tmp/graftbench/d100000000"

  private def session(extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  private def run(spark: SparkSession, intKeys: Boolean): Seq[(String, Double)] = {
    val raw = spark.read.parquet(dir)
    val df =
      if (!intKeys) raw
      else raw.withColumn("dept", xxhash64(col("dept")))
        .withColumn("city", xxhash64(col("city")))
    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "groupByDept" -> (() => df.groupBy("dept").agg(count(lit(1)))),
      "groupByDeptCity" -> (() => df.groupBy("dept", "city").agg(count(lit(1)))),
      "countDistinctDept" -> (() => df.agg(countDistinct(col("dept")))))
    shapes.map { case (name, q) =>
      q().write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      name -> runs.min
    }
  }

  /** Pre-materialized integer key columns: isolates the string-SCAN cost
    * (parquet dictionary decode to UTF8String) from the agg-map cost —
    * the surrogate-hash variant above still reads the strings. */
  private def runIntCols(spark: SparkSession): Seq[(String, Double)] = {
    val intDir = s"$dir-intcols"
    if (!new java.io.File(s"$intDir/_SUCCESS").exists()) {
      spark.read.parquet(dir)
        .withColumn("dept", xxhash64(col("dept")))
        .withColumn("city", xxhash64(col("city")))
        .write.mode("overwrite").parquet(intDir)
    }
    val df = spark.read.parquet(intDir)
    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "groupByDept" -> (() => df.groupBy("dept").agg(count(lit(1)))),
      "groupByDeptCity" -> (() => df.groupBy("dept", "city").agg(count(lit(1)))),
      "countDistinctDept" -> (() => df.agg(countDistinct(col("dept")))))
    shapes.map { case (name, q) =>
      q().write.format("noop").mode("overwrite").save()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      name -> runs.min
    }
  }

  def main(args: Array[String]): Unit = {
    val variants = Seq(
      ("default", Map.empty[String, String], false),
      ("vecmap", Map("spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"), false),
      ("intkey", Map.empty[String, String], true),
      ("vecmap+intkey", Map("spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"), true))
    variants.foreach { case (label, conf, intKeys) =>
      val spark = session(conf)
      spark.sparkContext.setLogLevel("WARN")
      val rs = run(spark, intKeys)
      rs.foreach { case (n, ms) => println(f"$label%-15s $n%-20s $ms%8.1f ms") }
      spark.stop()
      // a fresh session per variant (getOrCreate reuses the stopped
      // context's settings otherwise)
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    val spark = session(Map.empty)
    spark.sparkContext.setLogLevel("WARN")
    runIntCols(spark).foreach { case (n, ms) =>
      println(f"intcols         $n%-20s $ms%8.1f ms")
    }
    spark.stop()
  }
}
