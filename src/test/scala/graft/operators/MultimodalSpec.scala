package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("synthetic media matches the declared schema shape") {
    val df = media.toDF()
    assert(df.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(df.count() == 30)
  }

  test("extractFeatures is deterministic, partition-local, fixed-dim") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    val f2 = Multimodal.extractFeatures(media, dim = 16)
    assert(f1.count() == 30)
    val a = f1.orderBy("media_id").collect().map(m => (m.media_id, m.sha, m.features.toSeq))
    val b = f2.orderBy("media_id").collect().map(m => (m.media_id, m.sha, m.features.toSeq))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_._3.length == 16))
    // no shuffle: feature extraction plan has no Exchange
    val plan = f1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("sampleFrames explodes videos into frame rows") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    val videos = media.filter(_.kind == "video").collect()
    val expected = videos.map(v => math.max(1, (v.duration_ms / 1000L).toInt)).sum
    assert(frames.count() == expected)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "ts_ms", "frame_features"))
  }

  test("withResizedDims caps the long side, preserves aspect ratio") {
    val images = media.filter(_.kind == "image").toDF()
    val r = Multimodal.withResizedDims(images, maxSide = 256)
    val bad = r.filter(greatest($"resized_width", $"resized_height") > 256).count()
    assert(bad == 0)
    // aspect ratio approximately preserved
    val rows = r.select("width", "height", "resized_width", "resized_height")
      .as[(Int, Int, Int, Int)].collect()
    rows.foreach { case (w, h, rw, rh) =>
      assert(math.abs(w.toDouble / h - rw.toDouble / rh) < 0.05)
    }
  }
}
