package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dissect the per-query floor on the duck_bench shapes at sf0.1. */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("MPB", "134217728"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def timeIt(name: String)(f: => Unit): Unit = {
      f; f // warm
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-28s min=${runs.min}%8.1f ms  med=${runs.sorted.apply(2)}%8.1f ms")
    }
    val li = Tables.df(spark, d, "lineitem")
    println(s"input partitions: ${li.rdd.getNumPartitions}")
    timeIt("noop-empty") { spark.range(1).write.format("noop").mode("overwrite").save() }
    timeIt("b_sum cold-scan") {
      li.agg(expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"))
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("b_sum plain-double") {
      li.agg(sum("l_quantity")).write.format("noop").mode("overwrite").save()
    }
    timeIt("b_groupby cold-scan") {
      li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    }
    val cached = li.cache()
    cached.count() // materialize
    timeIt("b_sum cached") {
      cached.agg(expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"))
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("b_groupby cached") {
      cached.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    }
    timeIt("b_groupby_multi cached") {
      cached.groupBy("l_returnflag", "l_linestatus").count().write.format("noop").mode("overwrite").save()
    }
    timeIt("count-distinct cached") {
      cached.agg(countDistinct(col("l_partkey"))).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
