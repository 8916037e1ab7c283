package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.operators.Dedup

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    val docs = Tables.df(spark, d, "documents")
    time("shingles") { Dedup.charShingles(docs, "doc_id", "text", 5).count() }
    time("shingles+md5") {
      Dedup.charShingles(docs, "doc_id", "text", 5).select(md5(col("sh"))).count()
    }
    time("signatures") { Dedup.minHashSignatures(docs, "doc_id", "text", 5, 8).count() }
    time("pairs") { Dedup.minHashCandidatePairs(docs, "doc_id", "text", 5, 8, 2).count() }
    spark.stop()
  }
}
