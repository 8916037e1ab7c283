package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Corpus, Dedup}

/** Text-kernel throughput at a corpus volume 50× the bench scale:
  * replicates sf0.1's documents table (5k docs, ~290 shingles each) to
  * 250k docs / ~73M shingles, writes it as parquet, and times each
  * kernel stage end-to-end from storage. Compare with
  * `python3 tools/duck_text_scale.py <dir>` on the same parquet. */
object ProfileTextScale {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = s"/tmp/graftscale/docs_x$replicas"
    if (!new java.io.File(dir).exists()) {
      val base = Tables.df(spark, "/root/testdata/sf0.1", "documents")
        .select("doc_id", "text")
      base.crossJoin(spark.range(replicas).toDF("rep"))
        .select(($"doc_id" + $"rep" * 10000000L).as("doc_id"), $"text")
        .repartition(32)
        .write.mode("overwrite").parquet(dir)
    }
    val docs = spark.read.parquet(dir)
    val n = docs.count()
    println(s"corpus: $n docs")

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime(); val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s $sec%7.2f s  rows=$rows%-10d ${n / sec}%,.0f docs/s")
    }

    time("minhash_sigs") {
      Dedup.minHashSignatures(docs, "doc_id", "text", 5, 8).count()
    }
    time("simhash32") { Dedup.simHash32(docs, "doc_id", "text").count() }
    time("winnowing") {
      Dedup.winnowingFingerprints(docs, "doc_id", "text", 5, 4).count()
    }
    time("repetition_stats") {
      Corpus.repetitionMetrics(docs, "doc_id", "text").count()
    }
    time("curation_decisions") {
      Corpus.curationDecisions(docs, "doc_id", "text").count()
    }
    // auto routing: the replicated-docs vocabulary is closed, so the
    // probe should pick the one-pass aggregate here
    println(s"auto route on corpus: " +
      Corpus.chooseHeavyHitterRoute(docs, "text", 2000000L))
    time("heavy_hitters_auto") {
      Corpus.heavyHitters(docs, "doc_id", "text", 256).count()
    }
    time("heavy_hitters_mg") {
      Corpus.heavyHitters(docs, "doc_id", "text", 256, route = "mg").count()
    }
    // forced open-vocabulary fixture (every doc mints 16 fresh tokens →
    // ~4M-token vocabulary): the growth probe must route to the
    // bounded-state MG shape under the default 2M one-pass budget
    val open = docs.select($"doc_id",
      concat_ws(" ", (1 to 16).map(j =>
        concat(lit("u"), $"doc_id", lit(s"_$j"))): _*).as("text"))
    println(s"auto route on open vocabulary: " +
      Corpus.chooseHeavyHitterRoute(open, "text", 2000000L))
    time("contamination_scale") {
      Corpus.contaminationAtScale(docs.filter($"doc_id" % 40 =!= 0),
        docs.filter($"doc_id" % 40 === 0), "doc_id", "text", 3).count()
    }
    time("cdc_chunks") {
      Dedup.cdcChunks(docs, "doc_id", "text").count()
    }
    time("cdc_dup_ratio") {
      Dedup.cdcDupRatio(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
