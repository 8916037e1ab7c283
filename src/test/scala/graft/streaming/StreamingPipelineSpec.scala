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

  test("hash kernels + curation decisions run as a stateless stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    // one map-side pass per doc: simhash fingerprint, winnowing prints,
    // and the full first-failing-stage curation decision (its repetition
    // stage is the inline kernel — no join, no aggregate, streams as-is)
    val hashes = docs
      .withColumn("simhash",
        graft.functions.MinHashExpressions.simHash32(col("text")))
      .withColumn("n_prints",
        size(graft.functions.MinHashExpressions.winnowingPrints(col("text"), 5, 4)))
    val decisions = Corpus.curationDecisions(docs, "doc_id", "text",
      minChars = 5, maxChars = 1000)
    val q1 = hashes.writeStream.format("memory").queryName("kernel_stream")
      .outputMode("append").start()
    val q2 = decisions.writeStream.format("memory").queryName("decision_stream")
      .outputMode("append").start()
    try {
      val kept = "the quick brown fox jumps over the lazy dog and more " * 2
      in.addData((1L, kept.trim), (2L, "tiny"))
      q1.processAllAvailable(); q2.processAllAvailable()
      val stages = spark.table("decision_stream")
        .select("doc_id", "stage").as[(Long, String)].collect().toMap
      assert(stages(2L) == "1_length")
      assert(stages(1L) != "1_length")
      val sh = spark.table("kernel_stream").filter($"doc_id" === 1L)
        .select("simhash").as[Long].head()
      val batch = Seq((1L, kept.trim)).toDF("doc_id", "text")
        .select(graft.functions.MinHashExpressions.simHash32($"text")).as[Long].head()
      assert(sh == batch, "streaming and batch kernels must agree")
    } finally { q1.stop(); q2.stop() }
  }
}
