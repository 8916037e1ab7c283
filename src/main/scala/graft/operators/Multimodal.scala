package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Image/audio/video payloads are opaque `binary` columns plus a typed
  * metadata struct; decode / feature-extraction run as partition-local
  * batch kernels (`mapPartitions` over a typed Dataset — the Scala analog
  * of `mapInPandas` batching).
  *
  * IMAGE decode is REAL and JDK-only: `javax.imageio.ImageIO` ships
  * PNG/JPEG/BMP/GIF/WBMP readers in every JRE, so [[decodeImage]] returns
  * true pixel dimensions, the full-image mean luma, and a grid-downsampled
  * luma feature vector with zero external dependencies. CONTAINER-HEADER
  * decode is also real ([[sniff]]: PNG/JPEG/GIF/BMP dimensions, WAV
  * duration — fixed-layout byte parsing). Only AUDIO sample decode and
  * VIDEO frame decode remain STUBBED with a deterministic hash-derived
  * fake (no audio/video codec ships in the JDK) — swap [[stubDecode]] for
  * a real decoder (e.g. javacv) without touching the pipeline shape;
  * undecodable/hostile image bytes fall back to the same stub rather than
  * failing the partition.
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

  // ---- REAL container-header decode (no codec libraries needed: the
  // formats' dimensions/rates live in fixed-layout headers — this is the
  // non-stub part of decode, the pixel/sample decode behind it remains
  // stubbed) ----

  final case class SniffedMeta(media_id: Long, format: String, width: Int,
                               height: Int, duration_ms: Long)

  private def be16(b: Array[Byte], i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int) =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int) =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Parse real container headers: PNG IHDR, JPEG SOF, GIF, BMP
    * dimensions; WAV fmt/data chunks → duration. Unknown formats yield
    * ("unknown", -1, -1, 0) rather than failing — scrubbing pipelines must
    * tolerate hostile bytes. */
  private[operators] def sniff(id: Long, b: Array[Byte]): SniffedMeta = {
    def png = b.length >= 24 &&
      b.take(8).sameElements(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def jpeg = b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    def gif = b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
    def bmp = b.length >= 26 && b(0) == 'B' && b(1) == 'M'
    def wav = b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    try {
      if (png) SniffedMeta(id, "png", be32(b, 16), be32(b, 20), 0L)
      else if (jpeg) {
        // walk segment markers to the first SOFn (C0-CF minus C4/C8/CC)
        var i = 2
        var out: SniffedMeta = SniffedMeta(id, "jpeg", -1, -1, 0L)
        var done = false
        while (!done && i + 9 < b.length && (b(i) & 0xff) == 0xff) {
          val marker = b(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            out = SniffedMeta(id, "jpeg", be16(b, i + 7), be16(b, i + 5), 0L)
            done = true
          } else i += 2 + be16(b, i + 2)
        }
        out
      } else if (gif) SniffedMeta(id, "gif", le16(b, 6), le16(b, 8), 0L)
      // biHeight is signed: negative means top-down row order, same size
      // (abs in Long — math.abs(Int.MinValue) is still negative)
      else if (bmp) SniffedMeta(id, "bmp", le32(b, 18),
        math.abs(le32(b, 22).toLong).min(Int.MaxValue).toInt, 0L)
      else if (wav) {
        val byteRate = le32(b, 28)
        // scan RIFF chunks for the data chunk's size
        var i = 12L
        var dataLen = -1L
        while (dataLen < 0 && i + 8 <= b.length) {
          val sz = le32(b, i.toInt + 4).toLong & 0xffffffffL
          if (b(i.toInt) == 'd' && b(i.toInt + 1) == 'a' &&
            b(i.toInt + 2) == 't' && b(i.toInt + 3) == 'a') dataLen = sz
          // long arithmetic: sz is in [0, 0xFFFFFFFF], so the step is
          // always ≥ 8 and the scan terminates on hostile sizes
          else i += 8L + sz + (sz & 1)
        }
        val dur = if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L
        SniffedMeta(id, "wav", -1, -1, dur)
      } else SniffedMeta(id, "unknown", -1, -1, 0L)
    } catch { case _: Exception => SniffedMeta(id, "corrupt", -1, -1, 0L) }
  }

  /** Header-sniff a media table: real format detection + dimensions from
    * the payload bytes (partition-local, no shuffle). */
  def sniffMetadata(media: Dataset[MediaRecord]): Dataset[SniffedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => sniff(m.media_id, m.content)))
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
