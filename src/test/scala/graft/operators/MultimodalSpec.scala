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

  test("ImageIO decode: PNG golden fixture — exact dimensions and luma features") {
    // 8×4, left half black / right half white: with dim=16 the grid is
    // 4×4, cells 2px wide × 1px tall — each cell is uniformly black
    // (-0.5) or white (+0.5), and the mean luma is exactly mid-scale
    val png = Multimodal.encodeGrayPng(8, 4, (x, _) => if (x < 4) 0 else 255)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(7L, "image", png, "image/png", -1, -1, 0L)))
    val f = Multimodal.extractFeatures(media, dim = 16).collect().head
    assert(f.decoder == "imageio")
    assert(f.width == 8 && f.height == 4)
    assert(math.abs(f.mean_luma - 127.5) < 1e-6, s"mean_luma = ${f.mean_luma}")
    val expected = Seq.tabulate(16)(i => if (i % 4 < 2) -0.5f else 0.5f)
    f.features.zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(math.abs(got - exp) < 1e-6f, s"cell $i: $got != $exp")
    }
  }

  test("ImageIO decode: JPEG and BMP real encodes; hostile bytes fall back to the stub") {
    // uniform mid-gray survives JPEG's lossy round-trip almost exactly
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 10).foreach(y => (0 until 20).foreach(x =>
      img.setRGB(x, y, 0x808080)))
    for (fmt <- Seq("jpg", "bmp")) {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK can't write $fmt")
      val dec = Multimodal.decodeImage(out.toByteArray, 16)
      assert(dec.isDefined, s"$fmt did not decode")
      val (w, h, luma, feats) = dec.get
      assert(w == 20 && h == 10)
      assert(math.abs(luma - 128.0) < 3.0, s"$fmt mean luma $luma")
      assert(feats.length == 16)
    }
    // hostile bytes: decode refuses, extractFeatures falls back to stub
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3, 4), 16).isEmpty)
    val hostile = spark.createDataset(Seq(
      Multimodal.MediaRecord(9L, "image", Array[Byte](9, 9, 9), "image/png", -1, -1, 0L)))
    val hf = Multimodal.extractFeatures(hostile, dim = 8).collect().head
    assert(hf.decoder == "stub" && hf.width == -1 && hf.features.length == 8)
    // audio stays honestly stubbed (no sample codec in the JDK)
    val audio = spark.createDataset(Seq(
      Multimodal.MediaRecord(10L, "audio", Array[Byte](1, 1), "audio/wav", -1, -1, 99L)))
    assert(Multimodal.extractFeatures(audio).collect().head.decoder == "stub")
  }

  test("PCM decode: WAV golden fixture — duration, RMS, ZCR, spectral peak") {
    // 0.5 s sine at amplitude 0.5, 8 kHz mono 16-bit. The tone sits
    // EXACTLY on Goertzel bin 10's log-spaced center (~887 Hz): an
    // off-grid tone's rectangular-window sidelobes don't decay
    // monotonically, so only an on-bin tone makes "loudest bin" exact
    val rate = 8000
    val n = 4000
    val dim = 16
    val centers = Array.tabulate(dim)(k =>
      50.0 * math.pow(rate / 2.0 / 50.0, (k + 0.5) / dim))
    val freq = centers(10)
    val samples = Array.tabulate(n)(i =>
      (0.5 * 32767.0 * math.sin(2 * math.Pi * freq * i / rate)).toShort)
    val wav = Multimodal.encodePcmWav(rate, samples)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(3L, "audio", wav, "audio/wav", -1, -1, 0L)))
    val f = Multimodal.extractAudioFeatures(media, dim = 16).collect().head
    assert(f.decoder == "pcm")
    assert(f.sample_rate == rate && f.channels == 1)
    assert(f.duration_ms == 500L, s"duration = ${f.duration_ms}")
    // sine RMS = A/sqrt(2); finite-length + int16 quantization → loose tol
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms = ${f.rms}")
    // a sine at f Hz crosses zero 2·f times per second → 2f/rate per sample
    assert(math.abs(f.zero_cross_rate - 2 * freq / rate) < 0.01,
      s"zcr = ${f.zero_cross_rate}")
    // the loudest Goertzel bin (normalized to +0.5) is the on-tone bin
    val gotPeak = f.features.zipWithIndex.maxBy(_._1)._2
    assert(gotPeak == 10,
      s"spectral peak at bin $gotPeak (center ${centers(gotPeak)} Hz), " +
        s"expected 10 (center $freq Hz)")
    assert(f.features(gotPeak) == 0.5f)
  }

  test("PCM decode: stereo averages to mono; hostile bytes fall back to the stub") {
    val rate = 8000
    val n = 800
    // stereo with L = -R: the mono average cancels to (near-)silence
    val l = Array.tabulate(n)(i => (0.4 * 32767.0 * math.sin(2 * math.Pi * 300 * i / rate)).toShort)
    val bb = java.nio.ByteBuffer.allocate(44 + n * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 4).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(2)
      .putInt(rate).putInt(rate * 4).putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 4)
    l.foreach { s => bb.putShort(s); bb.putShort((-s).toShort); () }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "audio", bb.array(), "audio/wav", -1, -1, 0L),
      Multimodal.MediaRecord(2L, "audio", Array.fill[Byte](64)(0x41), "audio/wav", -1, -1, 0L)))
    val out = Multimodal.extractAudioFeatures(media, dim = 8)
      .collect().sortBy(_.media_id)
    assert(out(0).decoder == "pcm" && out(0).channels == 2)
    assert(out(0).rms < 1e-4, s"anti-phase stereo should cancel: rms = ${out(0).rms}")
    assert(out(1).decoder == "stub" && out(1).sample_rate == -1)
    assert(out(1).features.length == 8)
  }

  test("sniff parses MP4 boxes: mvhd duration, tkhd dimensions, hostile sizes") {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    // mvhd v0: ver/flags, ctime, mtime, timescale=600, duration=1500
    // (2.5 s), then the remaining 80 header bytes zeroed
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(600).putInt(1500)
      bb.array()
    }
    // tkhd v0: 76 zero bytes then width=640, height=360 in 16.16
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.position(76)
      bb.putInt(640 << 16).putInt(360 << 16)
      bb.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val moov = box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    val m = Multimodal.sniff(1L, ftyp ++ moov)
    assert(m.format == "mp4")
    assert(m.duration_ms == 2500L, s"duration = ${m.duration_ms}")
    assert(m.width == 640 && m.height == 360)
    // hostile: a box whose declared size is smaller than its header must
    // stop the walk, not loop
    val hostile = ftyp ++ box("moov", Array[Byte](0, 0, 0, 2, 'm', 'v', 'h', 'd'))
    val hm = Multimodal.sniff(2L, hostile)
    assert(hm.format == "mp4" && hm.duration_ms == 0L && hm.width == -1)
  }

  test("sniff parses real container headers: PNG, JPEG, GIF, WAV, hostile bytes") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR length/type + width=800, height=600
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x03, 0x20, 0, 0, 0x02, 0x58, 8, 6, 0, 0, 0)
    assert(Multimodal.sniff(1, png) == Multimodal.SniffedMeta(1, "png", 800, 600, 0L))
    // JPEG: SOI, APP0 (len 4, empty), SOF0 with height=240, width=320
    val jpeg = bytes(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0, 0,
      0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 0xf0, 0x01, 0x40, 3, 0, 0, 0)
    assert(Multimodal.sniff(2, jpeg) == Multimodal.SniffedMeta(2, "jpeg", 320, 240, 0L))
    // GIF89a 4x3
    val gif = bytes('G', 'I', 'F', '8', '9', 'a', 4, 0, 3, 0, 0, 0)
    assert(Multimodal.sniff(3, gif) == Multimodal.SniffedMeta(3, "gif", 4, 3, 0L))
    // WAV: RIFF/WAVE, fmt chunk with byteRate=1000, data chunk of 2500 bytes → 2500 ms
    val wav = bytes('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 1, 0, 0xe8, 0x03, 0, 0, 0xe8, 0x03, 0, 0, 1, 0, 8, 0,
      'd', 'a', 't', 'a', 0xc4, 0x09, 0, 0)
    assert(Multimodal.sniff(4, wav) == Multimodal.SniffedMeta(4, "wav", -1, -1, 2500L))
    // WAV with a JUNK chunk BEFORE fmt (broadcast-WAV tools emit these):
    // byteRate must come from the fmt chunk found by the walk, not a
    // fixed offset that now holds junk bytes
    val junkWav = bytes('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 4, 0, 0, 0, 0xde, 0xad, 0xbe, 0xef,
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 1, 0, 0xe8, 0x03, 0, 0, 0xe8, 0x03, 0, 0, 1, 0, 8, 0,
      'd', 'a', 't', 'a', 0xc4, 0x09, 0, 0)
    assert(Multimodal.sniff(7, junkWav) ==
      Multimodal.SniffedMeta(7, "wav", -1, -1, 2500L))
    // hostile/unknown bytes never throw
    assert(Multimodal.sniff(5, Array[Byte](1, 2, 3)).format == "unknown")
    assert(Multimodal.sniff(6, bytes(0xff, 0xd8, 0xff, 0xc0, 0x00)).width == -1)
    // distributed path
    val sniffed = Multimodal.sniffMetadata(Multimodal.syntheticMedia(spark, 9))
    assert(sniffed.count() == 9) // random payloads → mostly unknown, none crash
  }

  test("an AVI's AUDIO stream header never overwrites the video dimensions") {
    // hand-built two-stream AVI: video strl (BITMAPINFO 32x24) followed by
    // an audio strl whose strf is a WAVEFORMATEX — parsing it as
    // BITMAPINFO used to set width=nSamplesPerSec / height=nAvgBytesPerSec
    def le(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ le(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = chunk("avih", le(100000) ++ Array.fill[Byte](28)(0) ++
      le(32) ++ le(24) ++ Array.fill[Byte](16)(0))
    val vidsStrl = list("strl",
      chunk("strh", "vids".getBytes("US-ASCII") ++ Array.fill[Byte](52)(0)) ++
        chunk("strf", le(40) ++ le(32) ++ le(24) ++ Array.fill[Byte](28)(0)))
    val audsStrl = list("strl",
      chunk("strh", "auds".getBytes("US-ASCII") ++ Array.fill[Byte](52)(0)) ++
        // WAVEFORMATEX: tag/channels, nSamplesPerSec=44100 at +4,
        // nAvgBytesPerSec=176400 at +8 — the bytes that used to clobber
        chunk("strf", le(0x10001) ++ le(44100) ++ le(176400) ++
          le(0x100004) ++ le(0) ++ le(0)))
    val frame = chunk("00dc", Array.fill[Byte](8)(0x42))
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", avih ++ vidsStrl ++ audsStrl) ++ list("movi", frame)
    val avi = "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body
    val parsed = Multimodal.parseAvi(avi)
    assert(parsed.isDefined, "two-stream AVI failed to parse")
    assert(parsed.get.width == 32 && parsed.get.height == 24,
      s"audio strf clobbered dims: ${parsed.get.width}x${parsed.get.height}")
  }

  test("MJPEG-AVI decode: golden fixture — exact container metadata, close luma") {
    // 3 uniform-gray frames at distinct levels: container metadata is
    // exact; JPEG luma is lossy-close (uniform frames compress exactly
    // in practice, but only a tolerance is contractual)
    val levels = Seq(40, 128, 220)
    val avi = Multimodal.encodeMjpegAvi(32, 24, 10,
      levels.map(v => (_: Int, _: Int) => v))
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(5L, "video", avi, "video/x-msvideo", -1, -1, 300L)))
    val f = Multimodal.extractVideoFeatures(media, dim = 3).collect().head
    assert(f.decoder == "mjpeg", s"expected real decode, got ${f.decoder}")
    assert(f.width == 32 && f.height == 24)
    assert(f.n_frames == 3 && f.duration_ms == 300L)
    assert(math.abs(f.mean_luma - levels.sum / 3.0) < 3.0, s"luma ${f.mean_luma}")
    // temporal profile tracks the per-frame levels in order
    f.features.zip(levels).foreach { case (got, v) =>
      assert(math.abs(got - (v / 255.0 - 0.5)) < 0.02, s"$got vs level $v")
    }
    // sniff agrees with the decoder on container metadata
    val s5 = Multimodal.sniff(5L, avi)
    assert(s5 == Multimodal.SniffedMeta(5L, "avi", 32, 24, 300L))
  }

  test("sampleFrames decodes real MJPEG frames at the asked cadence only") {
    // 10 frames at 10 fps (1 s), sampled every 300 ms → floor(1000/300)=3
    // ticks at 0/300/600 ms (the same tick contract as the stub path) →
    // frame indices 0/3/6; per-frame grid features reflect each frame's
    // own gray level
    val levels = (0 until 10).map(k => 20 * k + 10)
    val avi = Multimodal.encodeMjpegAvi(16, 16, 10,
      levels.map(v => (_: Int, _: Int) => v))
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(9L, "video", avi, "video/x-msvideo", -1, -1, 1000L)))
    val rows = Multimodal.sampleFrames(media, everyMs = 300L)
      .orderBy("ts_ms")
      .as[(Long, Int, Long, Array[Float])].collect()
    assert(rows.map(r => (r._2, r._3)).toSeq ==
      Seq((0, 0L), (3, 300L), (6, 600L)))
    rows.foreach { case (_, idx, _, feats) =>
      val want = levels(idx) / 255.0 - 0.5
      feats.foreach(v => assert(math.abs(v - want) < 0.02, s"frame $idx: $v vs $want"))
    }
    // hostile bytes keep the stub path with metadata-derived ticks
    val junk = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "video", Array[Byte](1, 2, 3), "video/mp4",
        -1, -1, 700L)))
    val stubRows = Multimodal.sampleFrames(junk, everyMs = 300L).collect()
    assert(stubRows.length == 2) // max(1, 700/300)
  }

  test("extractVideoFeatures: non-MJPEG payloads fall back to the stub") {
    val vids = media.filter(_.kind == "video")
    val f = Multimodal.extractVideoFeatures(vids, dim = 8).collect()
    assert(f.nonEmpty)
    // syntheticMedia alternates MJPEG-AVI and MP4-header payloads
    val byDecoder = f.groupBy(_.decoder).view.mapValues(_.length).toMap
    assert(byDecoder.getOrElse("mjpeg", 0) > 0, s"no real decodes: $byDecoder")
    assert(byDecoder.getOrElse("stub", 0) > 0, s"no stub fallbacks: $byDecoder")
    f.filter(_.decoder == "mjpeg").foreach { v =>
      assert(v.width == 24 && v.height == 16 && v.n_frames >= 4)
      assert(v.duration_ms == v.n_frames * 125L)
    }
    f.filter(_.decoder == "stub").foreach { v =>
      assert(v.width == -1 && v.n_frames == -1)
    }
  }
}
