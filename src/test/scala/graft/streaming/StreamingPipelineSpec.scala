package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import graft.functions.TextFunctions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The corpus curation kernels ([[Corpus]], [[TextFunctions]]) are
  * stateless column expressions / map-side plans, so they compose with
  * Structured Streaming unchanged — a streaming ingest can chunk, score,
  * and sample documents micro-batch by micro-batch with zero state. This
  * spec pins that contract (a kernel accidentally introducing an
  * aggregation/sort would fail here with an unsupported-operation error at
  * stream start). */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("chunk + quality score + stratified sample run as a stateless stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val docs = in.toDF().toDF("doc_id", "lang", "text")
    // sample first (map-side filter), then chunk (map-side explode), then
    // score each chunk (column expressions)
    val piped = Corpus.chunk(
        Corpus.stratifiedSample(docs, "doc_id", "lang",
          Map("en" -> 1.0), defaultRate = 0.0),
        "doc_id", "text", chunkWords = 4, overlap = 0)
      .withColumn("n_tokens", TextFunctions.tokenCount(col("chunk_text")))
    val q = piped.writeStream.format("memory").queryName("pipe_test")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "en", "one two three four five six"),
        (2L, "zh", "dropped by the sampler"),
        (3L, "en", "tail"))
      q.processAllAvailable()
      val rows = spark.table("pipe_test")
        .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
        .as[(Long, Int, String, Int)].collect().toSet
      assert(rows == Set(
        (1L, 0, "one two three four", 4),
        (1L, 1, "five six", 2),
        (3L, 0, "tail", 1)))
    } finally q.stop()
  }
}
