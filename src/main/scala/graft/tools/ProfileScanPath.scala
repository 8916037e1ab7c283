package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SCAN-path twin of [[ScaleBench]]'s serving numbers: run the nine
  * baseline shapes over an existing gate table with the `_stats` sidecar
  * temporarily renamed away, so DictAggRule (codes) and the parquet scan
  * do the work the micro-cube normally folds. Keeps the honesty framing
  * measurable on the SAME table: serving ratio vs scan ratio, one flag
  * apart. Restores the sidecar on exit. */
object ProfileScanPath {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graftbench/t100000000/rev=1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = s"$dir/_stats"
    val off = s"$dir/_stats_off"
    val had = graft.sources.MetaIO.exists(stats)
    if (had) {
      val fs = graft.sources.MetaIO.fs(stats)
      fs.rename(new org.apache.hadoop.fs.Path(stats), new org.apache.hadoop.fs.Path(off))
    }
    try {
      graft.Graft.install(spark)
      val df = spark.read.parquet(dir)
      val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "filterCount" -> (() => df.filter(col("age") > 40 && col("active")).agg(count(lit(1)))),
        "groupByDept" -> (() => df.groupBy("dept").agg(count(lit(1)))),
        "sumAge" -> (() => df.agg(sum("age"))),
        "avgAge" -> (() => df.agg(avg("age"))),
        "minMaxAge" -> (() => df.agg(min("age"), max("age"))),
        "groupByDeptCity" -> (() => df.groupBy("dept", "city").agg(count(lit(1)))),
        "filterGroupBy" -> (() => df.filter(col("active")).groupBy("dept").agg(count(lit(1)))),
        "countDistinctDept" -> (() => df.agg(countDistinct(col("dept")))),
        "compoundAnd" -> (() => df.filter(col("age") > 30 && col("age") < 50 && col("active")).agg(count(lit(1)))))
      val out = shapes.map { case (name, q) =>
        q().write.format("noop").mode("overwrite").save()
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          q().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e6
        }
        println(f"scan    $name%-20s ${runs.min}%8.1f ms")
        name -> runs.min
      }
      val qs = out.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      println(s"""{"metric":"scan_path_ms","dir":"$dir","queries":$qs}""")
    } finally {
      if (had) {
        val fs = graft.sources.MetaIO.fs(off)
        fs.rename(new org.apache.hadoop.fs.Path(off), new org.apache.hadoop.fs.Path(stats))
      }
      spark.stop()
    }
  }
}
