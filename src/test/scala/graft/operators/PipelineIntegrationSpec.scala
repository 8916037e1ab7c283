package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline composition: multimodal payloads → stub feature
  * extraction → embedding near-dup + ANN search (the training-data
  * pipeline wired through real operators, no mocks). */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("media → features → near-dup pairs finds the planted duplicate payload") {
    val media = Multimodal.syntheticMedia(spark, 20)
    // plant an exact duplicate payload with a new id
    val planted = media.collect().head.copy(media_id = 999L)
    val withDup = media.union(Seq(planted).toDS())
    val feats = Multimodal.extractFeatures(withDup, dim = 16).toDF()
      .withColumn("grp", lit(1)) // single candidate group at this size
    val pairs = Similarity.nearDupPairs(feats, "media_id", "features", "grp", 0.9999)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 999L && p._3 == 1.0),
      s"planted dup not found in ${pairs.toSeq}")
  }

  test("media features → ANN top-k returns the query's duplicate first") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
    val q = feats.filter($"media_id" === 5L).select($"features".as("qvec"))
    val top = Similarity.annTopK(feats, "media_id", "features", 16, q, 3, nBits = 4)
      .as[(Long, Double)].collect()
    assert(top.nonEmpty && top.head._1 == 5L && top.head._2 == 1.0)
  }

  test("corpus curation: dedup → mix rebalance → stratified sample → packing") {
    val docs = (0 until 300).map { i =>
      val lang = if (i % 3 == 2) "es" else "en" // 200 en / 100 es, skewed
      val text =
        if (i % 10 == 0) "duplicate boilerplate text body here"
        else s"unique document $i body with enough words to pack"
      (i.toLong, text, lang)
    }.toDF("doc_id", "text", "lang")
    // 1. exact dedup: 30 boilerplate copies collapse to one survivor
    val keep = Dedup.exactDedup(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, "doc_id")
    assert(deduped.count() == 271)
    // 2. rebalance toward a 50/50 mix: es (scarce) kept whole, en cut
    val rates = Corpus.mixWeights(deduped, "lang", Map("en" -> 0.5, "es" -> 0.5))
      .select("lang", "sample_rate").as[(String, Double)].collect().toMap
    assert(rates("es") == 1.0 && rates("en") < 0.6, rates.toString)
    val sampled = Corpus.stratifiedSample(deduped, "doc_id", "lang", rates)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("es") == 90L, s"es must be kept whole: $byLang")
    // 3. pack the curated docs into fixed-budget training sequences
    val packed = Corpus.packSequences(sampled, "doc_id", "text",
      budget = 64, nShards = 4)
    assert(packed.count() == sampled.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    val firsts = packed.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
    assert(firsts.filter($"pack_offset" =!= 0L || $"pack_id" =!= 0L).count() == 0,
      "each shard's first doc starts pack 0 at offset 0")
  }

  test("daily increment: incremental dedup → mix apply → training order → packing") {
    // an existing corpus with a stored band table, and a new daily batch
    // where every tenth doc replays a corpus doc verbatim
    val corpus = (0 until 100).map(i =>
      (i.toLong, s"existing corpus document $i body with enough words")).toDF("doc_id", "text")
    val batch = (100 until 200).map { i =>
      val text =
        if (i % 10 == 0) s"existing corpus document ${i - 100} body with enough words"
        else s"fresh document $i body with plenty of unique words"
      (i.toLong, text, if (i % 4 == 0) "es" else "en")
    }.toDF("doc_id", "text", "lang")
    val corpusBands = Dedup.bandBuckets(corpus, "doc_id", "text", 5, 8, 2)
    val admitted = Dedup.incrementalDedup(batch, "doc_id", "text", corpusBands, 5, 8, 2)
    // every verbatim replay of a corpus doc is rejected; fresh docs survive
    assert(admitted.filter($"doc_id" % 10 === 0).count() == 0,
      "corpus replays must be rejected")
    assert(admitted.count() > 0)
    // rebalance: double the scarce es docs, keep en whole (epoch-tagged)
    val mixed = Corpus.applyMixRates(admitted, "doc_id", "lang",
      Map("es" -> 2.0, "en" -> 1.0))
    val byLang = admitted.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(mixed.count() == byLang.getOrElse("es", 0L) * 2 + byLang.getOrElse("en", 0L))
    // seeded global shuffle addressing every (doc, epoch) copy exactly once
    val ordered = Corpus.trainingOrder(mixed, "doc_id", seed = 1, nShards = 4,
      extraKeyCols = Seq("epoch"))
    assert(ordered.count() == mixed.count())
    assert(ordered.select("doc_id", "epoch").distinct().count() == mixed.count())
    // pack in shuffled order under a per-copy unique id
    val packed = Corpus.packSequences(
      ordered.withColumn("row_id", $"doc_id" * 2 + $"epoch"),
      "row_id", "text", budget = 64, nShards = 4)
    assert(packed.count() == mixed.count())
  }
}
