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
}
