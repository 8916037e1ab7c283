package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Graphs}

/** Dissect d_dedup_groups at sf0.1: band table vs star edges vs CC rounds. */
object ProfileDedupGroups {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def timeIt(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-28s min=${runs.min}%8.1f ms")
    }
    val docs = Tables.df(spark, d, "documents")
    println(s"docs: ${docs.count()}")

    timeIt("bands (shingle+minhash)") {
      Dedup.bandBuckets(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    val bands = Dedup.bandBuckets(docs, "doc_id", "text").localCheckpoint()
    timeIt("star edges (from pinned)") {
      val roots = bands.groupBy("band", "band_key").agg(min(col("doc_id")).as("__root"))
      bands.join(roots, Seq("band", "band_key"))
        .filter(col("doc_id") =!= col("__root"))
        .select(col("doc_id").as("id_a"), col("__root").as("id_b"))
        .distinct()
        .write.format("noop").mode("overwrite").save()
    }
    val roots = bands.groupBy("band", "band_key").agg(min(col("doc_id")).as("__root"))
    val edges = bands.join(roots, Seq("band", "band_key"))
      .filter(col("doc_id") =!= col("__root"))
      .select(col("doc_id").as("id_a"), col("__root").as("id_b"))
      .distinct().localCheckpoint()
    println(s"edges: ${edges.count()}")
    timeIt("CC (from pinned edges)") {
      Graphs.componentLabels(docs.select(col("doc_id")), "doc_id",
        edges, "id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("full dedupGroups") {
      Dedup.dedupGroups(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
