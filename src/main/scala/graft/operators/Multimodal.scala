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
  * luma feature vector with zero external dependencies. AUDIO decode is
  * also REAL and JDK-only: `javax.sound.sampled.AudioSystem` reads
  * WAV/AIFF/AU containers with PCM (plus a-law/µ-law via conversion), so
  * [[decodeAudio]] / [[extractAudioFeatures]] emit true duration, RMS,
  * zero-crossing rate and coarse Goertzel spectral bins. CONTAINER-HEADER
  * decode is real too ([[sniff]]: PNG/JPEG/GIF/BMP dimensions, WAV/AVI
  * durations, MP4 box walk — fixed-layout byte parsing). VIDEO frame
  * decode is REAL for Motion-JPEG AVI ([[decodeVideo]] /
  * [[extractVideoFeatures]] / [[sampleFrames]]): the RIFF container is a
  * fixed-layout chunk walk and each `00dc` frame payload is a plain JPEG,
  * which ImageIO decodes — true dimensions, frame count, duration, and
  * per-frame luma, still JDK-only. Inter-frame codecs (H.264 etc.) have
  * no JDK decoder and fall back to the deterministic hash-derived stub
  * ([[stubDecode]]) — swap it for a real decoder (e.g. javacv) without
  * touching the pipeline shape; undecodable/hostile bytes take the same
  * stub rather than failing the partition.
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

  /** Extraction output. For decodable images, `width`/`height`/`mean_luma`
    * are TRUE decoded values and `features` is the grid-downsampled luma
    * vector (`decoder` = "imageio"); for audio/video and undecodable
    * bytes, dimensions are -1, mean_luma is -1.0, and features fall back
    * to the deterministic stub (`decoder` = "stub"). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      width: Int,
      height: Int,
      mean_luma: Double,
      features: Array[Float],
      decoder: String)

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

  /** ImageIO's default stream cache is a temp FILE per read; decoding from
    * in-memory byte arrays must not touch disk on every row. Thread-safe
    * global flag, set once per JVM (executors included — the lazy val is
    * forced inside the decode kernel). */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode, JDK-only: `javax.imageio` reads PNG/JPEG/BMP/GIF
    * from the payload bytes — no external codec. Returns (width, height,
    * full-image mean luma, grid-downsampled luma features of length
    * `dim`), or None when the bytes aren't a decodable image (caller
    * falls back to the stub — scrubbing pipelines must tolerate hostile
    * bytes, so this never throws).
    *
    * Features: the image is partitioned into a ceil(sqrt(dim))² cell
    * grid; each cell's mean luma (ITU-R BT.601: 0.299 R + 0.587 G +
    * 0.114 B) maps to [-0.5, 0.5]; cells repeat cyclically when `dim`
    * isn't a perfect square. One row-major pass over the pixels,
    * O(width × height) per image, partition-local. */
  /** Pixel budget for [[decodeImage]]: dimensions are read from the
    * IMAGE HEADER (no pixel decode) and capped BEFORE the raster is
    * allocated — a few-KB decompression-bomb PNG declaring 50000×50000
    * would otherwise make ImageIO allocate a ~10 GB raster, and the
    * resulting OutOfMemoryError is an Error the never-throw contract's
    * `catch Exception` cannot stop. 64 MP covers every sane photo. */
  private val MaxImagePixels = 64L * 1024 * 1024

  private[operators] def decodeImage(content: Array[Byte], dim: Int)
      : Option[(Int, Int, Double, Array[Float])] =
    try {
      imageIoNoDiskCache
      // header-only dimension probe + bomb cap before any pixel decode
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val hw = reader.getWidth(0).toLong
          val hh = reader.getHeight(0).toLong
          if (hw <= 0 || hh <= 0 || hw * hh > MaxImagePixels) return None
        } finally reader.dispose()
      } finally iis.close()
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          val grid = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
          val sums = new Array[Double](grid * grid)
          val counts = new Array[Long](grid * grid)
          var total = 0.0
          // one getRGB call per row, not per pixel (BufferedImage's bulk
          // path converts to sRGB ints in a native loop)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            val gy = y * grid / h
            var x = 0
            while (x < w) {
              val rgb = row(x)
              val luma = 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              val c = gy * grid + x * grid / w
              sums(c) += luma
              counts(c) += 1
              total += luma
              x += 1
            }
            y += 1
          }
          val cells = Array.tabulate(grid * grid)(i =>
            if (counts(i) == 0) 0f
            else ((sums(i) / counts(i)) / 255.0 - 0.5).toFloat)
          val feats = Array.tabulate(dim)(i => cells(i % cells.length))
          Some((w, h, total / (w.toLong * h), feats))
        }
      }
    } catch { case _: Exception => None }

  /** Feature extraction over media payloads: partition-local batches, no
    * shuffle — the operator scales with input splits. Images decode for
    * real through [[decodeImage]]; audio/video (and undecodable bytes)
    * take the deterministic stub. `dim` is the feature dimensionality of
    * both paths. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // batch-shaped kernel: decode amortizes per-partition setup cost
      it.map { m =>
        val decoded = if (m.kind == "image") decodeImage(m.content, dim) else None
        decoded match {
          case Some((w, h, luma, feats)) =>
            MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
              shaHex(m.content), w, h, luma, feats, "imageio")
          case None =>
            MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
              shaHex(m.content), -1, -1, -1.0, stubDecode(m.content, dim), "stub")
        }
      }
    }
  }

  /** Audio extraction output. For decodable clips, `sample_rate`/
    * `channels`/`duration_ms`/`rms`/`zero_cross_rate` are TRUE decoded
    * values and `features` holds coarse spectral bins (`decoder` =
    * "pcm"); undecodable bytes yield -1 metrics and the deterministic
    * stub features (`decoder` = "stub"). */
  final case class AudioFeatures(
      media_id: Long,
      n_bytes: Long,
      sha: String,
      sample_rate: Int,
      channels: Int,
      duration_ms: Long,
      rms: Double,
      zero_cross_rate: Double,
      features: Array[Float],
      decoder: String)

  /** REAL audio decode, JDK-only (see object scaladoc). Returns
    * (sampleRate, channels, durationMs, rms, zeroCrossRate, spectral
    * features of length `dim`), or None when the bytes aren't decodable
    * audio — never throws, hostile bytes included.
    *
    *  - samples normalize to 16-bit signed PCM (AudioSystem conversion),
    *    channels average to mono, amplitudes scale to [-1, 1];
    *  - duration comes from the container's full frame count; analysis
    *    (RMS / ZCR / spectra) covers the first `maxSamples` frames so a
    *    pathological multi-hour payload costs bounded work per row;
    *  - ZCR = sign flips / (n-1) ∈ [0, 1] (1 ≈ Nyquist-rate alternation);
    *  - features: Goertzel power at `dim` log-spaced frequencies in
    *    [50 Hz, Nyquist), each mapped to [-0.5, 0.5] by normalizing to
    *    the loudest bin — the audio analog of the image grid-luma vector.
    *    One O(dim × n) pass, partition-local. */
  private[operators] def decodeAudio(content: Array[Byte], dim: Int,
                                     maxSamples: Int = 1 << 16)
      : Option[(Int, Int, Long, Double, Double, Array[Float])] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val src = raw.getFormat
        val rate = src.getSampleRate.toInt
        val channels = src.getChannels
        val frames = raw.getFrameLength
        if (rate <= 0 || channels <= 0 || frames <= 0) return None
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, channels, 2 * channels, src.getSampleRate,
          false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
        try {
          val nFrames = math.min(frames, maxSamples.toLong).toInt
          val bytes = pcm.readNBytes(nFrames * 2 * channels)
          val n = bytes.length / (2 * channels)
          if (n == 0) return None
          // mono-average normalized samples
          val mono = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < channels) {
              val o = (i * channels + c) * 2
              val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
              acc += s / 32768.0
              c += 1
            }
            mono(i) = acc / channels
            i += 1
          }
          var sumSq = 0.0
          var flips = 0L
          i = 0
          while (i < n) {
            sumSq += mono(i) * mono(i)
            if (i > 0 && (mono(i) > 0) != (mono(i - 1) > 0)) flips += 1
            i += 1
          }
          val rms = math.sqrt(sumSq / n)
          val zcr = if (n > 1) flips.toDouble / (n - 1) else 0.0
          // Goertzel power at dim log-spaced frequencies in [50, Nyquist)
          val fLo = 50.0
          val fHi = math.max(fLo * 2, rate / 2.0)
          val powers = Array.tabulate(dim) { k =>
            val f = fLo * math.pow(fHi / fLo, (k + 0.5) / dim)
            val w = 2.0 * math.Pi * f / rate
            val coeff = 2.0 * math.cos(w)
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
            var j = 0
            while (j < n) {
              s0 = mono(j) + coeff * s1 - s2
              s2 = s1; s1 = s0
              j += 1
            }
            s1 * s1 + s2 * s2 - coeff * s1 * s2
          }
          val peak = powers.max
          val feats =
            if (peak <= 0) Array.fill(dim)(-0.5f)
            else powers.map(p => (p / peak - 0.5).toFloat)
          val durMs = math.round(frames * 1000.0 / rate)
          Some((rate, channels, durMs, rms, zcr, feats))
        } finally pcm.close()
      } finally raw.close()
    } catch { case _: Exception => None }

  /** Audio-feature extraction: the audio twin of [[extractFeatures]] —
    * partition-local batches, no shuffle, real PCM decode with the stub
    * fallback for undecodable bytes. */
  def extractAudioFeatures(media: Dataset[MediaRecord], dim: Int = 16)
      : Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decoded = if (m.kind == "audio") decodeAudio(m.content, dim) else None
        decoded match {
          case Some((rate, ch, dur, rms, zcr, feats)) =>
            AudioFeatures(m.media_id, m.content.length.toLong, shaHex(m.content),
              rate, ch, dur, rms, zcr, feats, "pcm")
          case None =>
            AudioFeatures(m.media_id, m.content.length.toLong, shaHex(m.content),
              -1, -1, -1L, -1.0, -1.0, stubDecode(m.content, dim), "stub")
        }
      }
    }
  }

  /** Deterministic in-memory mono 16-bit PCM WAV encode (44-byte RIFF
    * header + little-endian samples) — real encoded bytes for specs and
    * the decode oracle, JDK-free of codecs. Lossless, so a decode of
    * these bytes reproduces the samples exactly. */
  private[graft] def encodePcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => { bb.putShort(s); () })
    bb.array()
  }

  /** Deterministic in-memory Motion-JPEG AVI encode: each frame is a
    * computed grayscale pattern (`frame(k)(x, y)` → 0-255) JPEG-encoded
    * via ImageIO and wrapped in the RIFF chunk tree ([[parseAvi]]'s
    * layout) — real encoded bytes for specs, [[syntheticMedia]] and the
    * decode oracle. JPEG is lossy, so decoded luma is CLOSE to the
    * pattern (container metadata — dimensions, cadence, frame count — is
    * exact). */
  private[graft] def encodeMjpegAvi(w: Int, h: Int, fps: Int,
                                    frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty, "encodeMjpegAvi: bad args")
    imageIoNoDiskCache
    val jpegs = frames.map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = f(x, y) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    def chunk(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(tpe.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(tpe: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ payload)
    val usPerFrame = 1000000 / fps
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(jpegs.length).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h)
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps) // dwScale / dwRate → fps
        .putInt(0).putInt(jpegs.length).putInt(0).putInt(-1).putInt(0)
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** Deterministic in-memory PNG encode of a computed grayscale pattern
    * (`pixel(x, y)` → 0-255) — real encoded bytes for specs and the
    * decode oracle, JDK-only. PNG is lossless, so a decode of these bytes
    * reproduces the pattern exactly. */
  private[graft] def encodeGrayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    imageIoNoDiskCache
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixel(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- REAL video decode: Motion-JPEG in a RIFF AVI container.
  // The container is a fixed-layout chunk tree ([size:u32 LE][fourcc]),
  // and every `00dc`/`00db` frame payload is a standalone JPEG — ImageIO
  // decodes it like any still. This is the one video format a JDK-only
  // engine can decode end-to-end; anything else falls back to the stub.

  /** A parsed MJPEG-AVI: header metadata plus each frame chunk's
    * (offset, length) into the original payload — frames decode lazily so
    * a sampler touches only the frames it asks for. */
  private[operators] final case class AviStreams(
      width: Int, height: Int, usPerFrame: Long, frames: Seq[(Int, Int)]) {
    def nFrames: Int = frames.size
    def durationMs: Long = usPerFrame * nFrames / 1000L
  }

  /** Parse the RIFF AVI chunk tree: `avih` (frame cadence, fallback
    * dimensions), `strf` BITMAPINFOHEADER (authoritative dimensions), and
    * the `movi` list's frame chunks. Bounded work — one linear walk over
    * chunk HEADERS (frame payloads are not touched), hostile sizes
    * terminate the walk (every step advances ≥ 8 bytes). Returns None
    * unless the payload is a RIFF AVI with at least one video frame. */
  private[operators] def parseAvi(b: Array[Byte]): Option[AviStreams] =
    try {
      if (b.length < 24 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ') return None
      var usPerFrame = 0L
      var w = -1; var h = -1
      // the stream type of the most recent strh: an strf's layout depends
      // on it (BITMAPINFOHEADER for 'vids', WAVEFORMATEX for 'auds') — an
      // ungated parse of an audio strf would overwrite the video
      // dimensions with nSamplesPerSec/nAvgBytesPerSec on any AVI that
      // also carries an audio stream
      var curStream = ""
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def fourcc(i: Int) = new String(b, i, 4, "US-ASCII")
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var i = from
        while (i + 8 <= to && depth < 8) {
          val tpe = fourcc(i.toInt)
          val sz = le32(b, i.toInt + 4).toLong & 0xffffffffL
          val end = math.min(to, i + 8 + sz)
          tpe match {
            case "LIST" if i + 12 <= to =>
              // hdrl (stream headers) and movi (frame data) both recurse;
              // strl nests inside hdrl
              walk(i + 12, end, depth + 1)
            case "avih" if i + 8 + 40 <= to =>
              val o = i.toInt + 8
              usPerFrame = le32(b, o).toLong & 0xffffffffL
              if (w < 0) { w = le32(b, o + 32); h = le32(b, o + 36) }
            case "strh" if i + 8 + 4 <= to =>
              curStream = fourcc(i.toInt + 8) // 'vids' / 'auds' / ...
            case "strf" if curStream == "vids" && i + 8 + 24 <= to &&
                sz >= 24 =>
              // BITMAPINFOHEADER: biWidth/biHeight at +4/+8 (biHeight
              // signed; negative = top-down rows, same magnitude)
              val o = i.toInt + 8
              w = le32(b, o + 4)
              h = math.abs(le32(b, o + 8).toLong).min(Int.MaxValue).toInt
            case t if t.length == 4 && t.charAt(2) == 'd' &&
                (t.charAt(3) == 'c' || t.charAt(3) == 'b') &&
                t.charAt(0).isDigit && t.charAt(1).isDigit =>
              if (sz > 0 && i + 8 + sz <= b.length)
                frames += ((i.toInt + 8, sz.toInt))
            case _ =>
          }
          i += 8 + sz + (sz & 1) // chunks pad to even
        }
      }
      walk(12L, b.length.toLong, 0)
      if (frames.isEmpty || w <= 0 || h <= 0) None
      else Some(AviStreams(w, h, usPerFrame, frames.toSeq))
    } catch { case _: Exception => None }

  /** Video extraction output. For decodable MJPEG-AVI payloads,
    * `width`/`height`/`duration_ms`/`n_frames`/`mean_luma` are TRUE
    * decoded values and `features` is the temporal luma profile
    * (`decoder` = "mjpeg"); other codecs and undecodable bytes yield -1
    * metrics and the deterministic stub (`decoder` = "stub"). */
  final case class VideoFeatures(
      media_id: Long,
      n_bytes: Long,
      sha: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_frames: Int,
      mean_luma: Double,
      features: Array[Float],
      decoder: String)

  /** REAL video decode (MJPEG-AVI, see object scaladoc). Returns (width,
    * height, durationMs, nFrames, meanLuma, temporal luma profile of
    * length `dim`), or None when the payload isn't a decodable MJPEG AVI.
    *
    * The profile samples `min(dim, maxFrames)` frames evenly across the
    * stream, decodes each JPEG, and maps its mean luma to [-0.5, 0.5] —
    * the temporal analog of the image grid-luma vector (profile entries
    * cycle when fewer frames than `dim` decode). Work is bounded by
    * `maxFrames` JPEG decodes per row regardless of stream length. */
  private[operators] def decodeVideo(content: Array[Byte], dim: Int,
                                     maxFrames: Int = 32)
      : Option[(Int, Int, Long, Int, Double, Array[Float])] =
    parseAvi(content).flatMap { avi =>
      // post-parse body under try: parseAvi validates the container, but a
      // hostile index can still name absurd frame counts/offsets — the
      // hostile-bytes contract is "fall back to the stub", never throw.
      // Long arithmetic on the sample index: k * n overflows Int past
      // ~2^31/take tiny frame chunks.
      try {
        val n = avi.nFrames
        val take = math.min(math.min(dim, maxFrames), n)
        val lumas = (0 until take).flatMap { k =>
          val (off, len) = avi.frames((k.toLong * n / take).toInt)
          decodeImage(java.util.Arrays.copyOfRange(content, off, off + len), 1)
            .map(_._3)
        }
        if (lumas.isEmpty) None
        else {
          val feats = Array.tabulate(dim)(i =>
            (lumas(i % lumas.length) / 255.0 - 0.5).toFloat)
          Some((avi.width, avi.height, avi.durationMs, n,
            lumas.sum / lumas.length, feats))
        }
      } catch { case _: RuntimeException => None }
    }

  /** Video-feature extraction: the video twin of [[extractFeatures]] —
    * partition-local batches, no shuffle, real MJPEG-AVI decode with the
    * stub fallback for other codecs and hostile bytes. */
  def extractVideoFeatures(media: Dataset[MediaRecord], dim: Int = 16)
      : Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decoded = if (m.kind == "video") decodeVideo(m.content, dim) else None
        decoded match {
          case Some((w, h, dur, n, luma, feats)) =>
            VideoFeatures(m.media_id, m.content.length.toLong, shaHex(m.content),
              w, h, dur, n, luma, feats, "mjpeg")
          case None =>
            VideoFeatures(m.media_id, m.content.length.toLong, shaHex(m.content),
              -1, -1, -1L, -1, -1.0, stubDecode(m.content, dim), "stub")
        }
      }
    }
  }

  /** Frame sampling for video payloads: one row per sampled frame
    * (1 row → N frames, the explode-shaped multimodal transform). MJPEG-
    * AVI payloads decode for REAL: the sampler maps each `everyMs` tick
    * to its frame index from the stream's cadence, decodes ONLY those
    * JPEGs (the parse keeps frame offsets, so unsampled frames are never
    * touched — at one frame per 10 s of a 100 TB corpus that is the
    * difference between decoding 0.3% and 100% of the bytes), and emits
    * the true per-frame grid-luma features with true timestamps. Other
    * codecs keep the deterministic stub with metadata-derived ticks. */
  /** Per-row tick-count ceiling for [[sampleFrames]]: a hostile header
    * can declare a multi-year duration; `(durMs / step).toInt` would
    * silently wrap NEGATIVE and emit zero rows (neither frames nor the
    * stub — a vanished video). Long math + this cap bound the fan-out. */
  private val MaxSampledFrames = 100000L

  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    val step = math.max(1L, everyMs)
    media.filter(_.kind == "video")
      .flatMap { m =>
        parseAvi(m.content) match {
          case Some(avi) if avi.usPerFrame > 0 =>
            val durMs = avi.durationMs
            val n = math.min(MaxSampledFrames, math.max(1L, durMs / step)).toInt
            // cache the last decoded frame: several ticks can map to one
            // frame (everyMs below the frame interval) — re-decoding the
            // same JPEG per tick multiplied the decode cost for nothing
            var lastIdx = -1
            var lastFeats: Option[Array[Float]] = None
            (0 until n).flatMap { i =>
              val tsMs = i * step
              val idx = math.min(avi.nFrames - 1L, tsMs * 1000L / avi.usPerFrame).toInt
              if (idx != lastIdx) {
                lastIdx = idx
                val (off, len) = avi.frames(idx)
                lastFeats = decodeImage(
                  java.util.Arrays.copyOfRange(m.content, off, off + len), 8)
                  .map { case (_, _, _, feats) => feats }
              }
              lastFeats.map(f => (m.media_id, idx, tsMs, f))
            }
          case _ =>
            val n = math.min(MaxSampledFrames, math.max(1L, m.duration_ms / step)).toInt
            // STUB frame decode: hash the payload ONCE, mix the tick index
            // into the seed — copying and re-hashing the whole payload per
            // tick was O(ticks × bytes) memory traffic for one input row
            val base = stubDecode(m.content, 8)
            (0 until n).map { i =>
              val tsMs = i * step
              val feats = Array.tabulate(8)(j =>
                base((j + i) % 8) + (((i * 31 + j) % 7) - 3) * 1e-4f)
              (m.media_id, i, tsMs, feats)
            }
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
    * dimensions; WAV fmt/data chunks → duration; MP4/ISO-BMFF box walk →
    * movie duration (`mvhd`) and track dimensions (`tkhd`). Unknown
    * formats yield ("unknown", -1, -1, 0) rather than failing — scrubbing
    * pipelines must tolerate hostile bytes. */
  private[operators] def sniff(id: Long, b: Array[Byte]): SniffedMeta = {
    def png = b.length >= 24 &&
      b.take(8).sameElements(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def jpeg = b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    def gif = b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
    def bmp = b.length >= 26 && b(0) == 'B' && b(1) == 'M'
    def wav = b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    def avi = b.length >= 24 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '
    def mp4 = b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'
    try {
      if (png) SniffedMeta(id, "png", be32(b, 16), be32(b, 20), 0L)
      else if (avi) parseAvi(b) match {
        case Some(s) => SniffedMeta(id, "avi", s.width, s.height, s.durationMs)
        case None => SniffedMeta(id, "avi", -1, -1, 0L)
      }
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
        // scan RIFF chunks for fmt (byteRate at +8 of its payload) and
        // data. byteRate used to read from FIXED offset 28, assuming fmt
        // starts at 12 — a legal WAV with a JUNK/LIST chunk before fmt
        // (broadcast-WAV tools emit these) put garbage there and the
        // duration came out wild; the same chunk walk that finds data
        // finds fmt.
        var i = 12L
        var dataLen = -1L
        var byteRate = -1
        while ((dataLen < 0 || byteRate < 0) && i + 8 <= b.length) {
          val sz = le32(b, i.toInt + 4).toLong & 0xffffffffL
          val isData = b(i.toInt) == 'd' && b(i.toInt + 1) == 'a' &&
            b(i.toInt + 2) == 't' && b(i.toInt + 3) == 'a'
          val isFmt = b(i.toInt) == 'f' && b(i.toInt + 1) == 'm' &&
            b(i.toInt + 2) == 't' && b(i.toInt + 3) == ' '
          if (isData) dataLen = sz
          else if (isFmt && sz >= 12 && i + 8 + 12 <= b.length)
            byteRate = le32(b, i.toInt + 8 + 8)
          // long arithmetic: sz is in [0, 0xFFFFFFFF], so the step is
          // always ≥ 8 and the scan terminates on hostile sizes
          if (dataLen < 0 || byteRate < 0) i += 8L + sz + (sz & 1)
        }
        val dur = if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L
        SniffedMeta(id, "wav", -1, -1, dur)
      } else if (mp4) {
        // ISO-BMFF box walk: [size:u32 BE][type:4cc] (size 1 → u64
        // follows). `moov`/`trak` recurse; `mvhd` carries movie
        // timescale+duration (v0: u32s at payload +12/+16; v1: 64-bit
        // times, timescale at +20, duration u64 at +24); `tkhd` carries
        // 16.16 fixed-point width/height after the transform matrix
        // (payload +76 for v0, +88 for v1). Hostile sizes stop the walk
        // (step is always ≥ the header size); depth is bounded.
        def u32(o: Int): Long = be32(b, o).toLong & 0xffffffffL
        var dur = 0L; var w = -1; var h = -1
        def walk(from: Long, to: Long, depth: Int): Unit = {
          var i = from
          while (i + 8 <= to && depth < 8) {
            val sz0 = u32(i.toInt)
            val hdr = if (sz0 == 1 && i + 16 <= to) 16L else 8L
            val sz =
              if (sz0 == 1 && i + 16 <= to)
                (u32(i.toInt + 8) << 32) | u32(i.toInt + 12)
              else if (sz0 == 0) to - i // box extends to end of enclosure
              else sz0
            if (sz < hdr) return // hostile: would not advance
            val tpe = new String(b, i.toInt + 4, 4, "US-ASCII")
            val end = math.min(to, i + sz)
            tpe match {
              case "moov" | "trak" => walk(i + hdr, end, depth + 1)
              case "mvhd" if i + hdr + 20 <= to =>
                val o = (i + hdr).toInt
                if ((b(o) & 0xff) == 1 && i + hdr + 32 <= to) {
                  val ts = u32(o + 20)
                  val d = (u32(o + 24) << 32) | u32(o + 28)
                  if (ts > 0) dur = d * 1000L / ts
                } else {
                  val ts = u32(o + 12)
                  val d = u32(o + 16)
                  if (ts > 0) dur = d * 1000L / ts
                }
              case "tkhd" if i + hdr + 1 <= to =>
                // version-byte read bounds-guarded like mvhd: a truncated
                // trailing tkhd otherwise threw out of the box walk and
                // flipped the whole sniff (mvhd duration included) to
                // "corrupt"
                val o = (i + hdr).toInt
                val wOff = if ((b(o) & 0xff) == 1) o + 88 else o + 76
                if (wOff + 8 <= b.length) {
                  val tw = (u32(wOff) >> 16).toInt
                  val th = (u32(wOff + 4) >> 16).toInt
                  if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
                }
              case _ =>
            }
            i += math.max(sz, hdr)
          }
        }
        walk(0L, b.length.toLong, 0)
        SniffedMeta(id, "mp4", w, h, dur)
      } else SniffedMeta(id, "unknown", -1, -1, 0L)
    } catch { case _: Exception => SniffedMeta(id, "corrupt", -1, -1, 0L) }
  }

  /** Header-sniff a media table: real format detection + dimensions from
    * the payload bytes (partition-local, no shuffle). */
  def sniffMetadata(media: Dataset[MediaRecord]): Dataset[SniffedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => sniff(m.media_id, m.content)))
  }

  /** Deterministic synthetic media table for tests/demos. Audio payloads
    * are REAL mono PCM WAVs (a seeded sine, decodable by
    * [[extractAudioFeatures]]); video payloads alternate between a REAL
    * Motion-JPEG AVI (gradient frames — fully decodable by
    * [[extractVideoFeatures]]/[[sampleFrames]]) and a REAL MP4
    * `ftyp`+`moov` header (mvhd duration matching the metadata column,
    * parseable by [[sniff]]) ahead of pseudo-random "codec" bytes — the
    * stub-fallback path; image payloads stay pseudo-random bytes —
    * exercising the hostile-bytes stub fallback is part of the demo. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rnd = new scala.util.Random(i)
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val mjpeg = kind == "video" && (i / 3) % 2 == 0
      val durMs =
        if (mjpeg) (4 + (i % 5)) * 125L // nFrames / 8 fps
        else if (kind == "video") 1000L + rnd.nextInt(10000)
        else 0L
      val bytes = kind match {
        case "video" if mjpeg =>
          val nf = 4 + (i % 5).toInt
          encodeMjpegAvi(24, 16, 8, (0 until nf).map(k =>
            (x: Int, y: Int) => (x * 9 + y * 5 + k * 31 + i.toInt) % 256))
        case "audio" =>
          val rate = 8000
          val samples = Array.tabulate(800 + rnd.nextInt(800))(j =>
            (0.4 * 32767.0 * math.sin(2 * math.Pi * (200 + i % 11 * 50) * j / rate)).toShort)
          encodePcmWav(rate, samples)
        case "video" =>
          def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
            val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
            bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
            bb.array()
          }
          val mvhd = {
            val bb = java.nio.ByteBuffer.allocate(100)
            bb.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(durMs.toInt)
            bb.array()
          }
          box("ftyp", "isomiso2".getBytes("US-ASCII")) ++ box("moov", box("mvhd", mvhd)) ++
            Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
        case _ =>
          Array.fill[Byte](64 + rnd.nextInt(64))(rnd.nextInt().toByte)
      }
      val mime =
        if (mjpeg) "video/x-msvideo"
        else Map("image" -> "image/png", "audio" -> "audio/wav",
          "video" -> "video/mp4")(kind)
      MediaRecord(i, kind, bytes, mime,
        if (kind == "image") 640 + rnd.nextInt(1280) else -1,
        if (kind == "image") 480 + rnd.nextInt(720) else -1,
        durMs)
    }
  }
}
