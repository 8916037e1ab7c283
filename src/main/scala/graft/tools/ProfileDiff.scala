package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Diff

/** Diff strategy timing at sf0.1 with a 1% change rate. */
object ProfileDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.df(spark, "/root/testdata/sf0.1", "lineitem")
      .withColumn("node_key", monotonically_increasing_id()).cache()
    val li2 = li.withColumn("l_quantity",
      expr("CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 1 ELSE l_quantity END")).cache()
    li.count(); li2.count()
    def time(name: String)(f: => Long): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
      }
      println(f"$name%-24s ${runs.map(_._1).min}%8.1f ms rows=${runs.head._2}")
    }
    time("plain diff") { Diff.diff(li, li2, Seq("node_key")).count() }
    time("pruned 1024") { Diff.prunedDiff(li, li2, Seq("node_key"), numBuckets = 1024).count() }
    time("pruned 65536") { Diff.prunedDiff(li, li2, Seq("node_key"), numBuckets = 65536).count() }
    time("pruned 1048576") { Diff.prunedDiff(li, li2, Seq("node_key"), numBuckets = 1 << 20).count() }
    spark.stop()
  }
}
