package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Image/audio/video payloads are opaque `binary` columns plus a typed
  * metadata struct; decode / feature-extraction run as partition-local
  * batch kernels (`mapPartitions` over a typed Dataset — the Scala analog
  * of `mapInPandas` batching). The Spark-side plumbing (schema, typed
  * encoders, batch shape, partition sizing) is real and tested; the actual
  * media decode is STUBBED with a deterministic hash-derived fake because
  * no codec libraries ship in this environment — swap `stubDecode` for a
  * real decoder (e.g. javacv) without touching the pipeline shape.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,              // image | audio | video
      content: Array[Byte],
      mime: String,
      width: Int,                // -1 when unknown / not applicable
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** STUB decode kernel: deterministic pseudo-features from the payload's
    * SHA-256 — stands in for a real image/audio decoder (??? in spirit;
    * the surrounding distributed plumbing is the deliverable). */
  private[operators] def stubDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(content)
    Array.tabulate(dim)(i => ((sha(i % sha.length) & 0xff) / 255.0f) - 0.5f)
  }

  private def shaHex(content: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(content)
      .map("%02x".format(_)).mkString

  /** Feature extraction over media payloads: partition-local batches, no
    * shuffle — the operator scales with input splits. `dim` is the feature
    * dimensionality of the (stubbed) decoder. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // batch-shaped kernel: decode amortizes per-partition setup cost
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          shaHex(m.content), stubDecode(m.content, dim))
      }
    }
  }

  /** Frame sampling for video payloads: emits one row per sampled frame
    * index with a (stubbed) per-frame payload slice. Demonstrates the
    * explode-shaped multimodal transform (1 row → N frames). */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { m =>
        val n = math.max(1, (m.duration_ms / math.max(1, everyMs)).toInt)
        (0 until n).map { i =>
          val tsMs = i * everyMs
          // STUB frame decode: slice of the payload hash as the "frame"
          (m.media_id, i, tsMs, stubDecode(m.content ++ BigInt(i).toByteArray, 8))
        }
      }
      .toDF("media_id", "frame_idx", "ts_ms", "frame_features")
  }

  /** Resize metadata transform (pure column math — no decode needed). */
  def withResizedDims(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    df.withColumn("resized_width", ceil(col("width") * scale).cast("int"))
      .withColumn("resized_height", ceil(col("height") * scale).cast("int"))
  }

  /** Deterministic synthetic media table for tests/demos (no codecs in the
    * environment, so payloads are seeded pseudo-random bytes). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rnd = new scala.util.Random(i)
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val bytes = Array.fill[Byte](64 + rnd.nextInt(64))(rnd.nextInt().toByte)
      MediaRecord(i, kind, bytes,
        Map("image" -> "image/png", "audio" -> "audio/wav", "video" -> "video/mp4")(kind),
        if (kind == "image") 640 + rnd.nextInt(1280) else -1,
        if (kind == "image") 480 + rnd.nextInt(720) else -1,
        if (kind == "video") 1000L + rnd.nextInt(10000) else 0L)
    }
  }
}
