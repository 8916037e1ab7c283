package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Corpus, Dedup, IvfIndex, Pq, Quantize, Similarity}

/** Training-data pipeline operators (builder brief: dedup, similarity
  * search, text analysis) over the `documents` and `embeddings` tables.
  * Every query routes through the library operators in
  * [[graft.operators.Dedup]] / [[graft.operators.Similarity]] /
  * [[graft.functions.TextFunctions]]; the oracles re-derive the identical
  * md5-based kernels in DuckDB SQL.
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.df(s, d, "documents")
  private def emb(s: SparkSession, d: String): DataFrame = Tables.df(s, d, "embeddings")

  /** Per-run root for oracle-shared sidecars: the query writes parquet
    * here and the DuckDB oracle reads the SAME resolved absolute path
    * (interpolated into the SQL below). Per-run (fresh temp dir per JVM)
    * rather than fixed `/tmp/graft_*` names, so concurrent or stale runs
    * can't clobber each other and a pre-created path from another user on
    * a shared host can't poison the oracle's input. */
  private lazy val runDir: String =
    java.nio.file.Files.createTempDirectory("graft-oracle-sidecars").toString

  /** Sidecar path for the s_semantic_dedup cell assignment. */
  private lazy val semDedupCellsPath = s"$runDir/semdedup_cells"

  /** Sidecar path for the d_dedup_best group labels. */
  private lazy val dedupBestGroupsPath = s"$runDir/dedup_best_groups"

  /** Paths for the s_ivf_search oracle: the clustered index itself plus
    * (vec_id, ivf_cell) and (cell, centroid) parquet sidecars the oracle
    * re-derives the probe + scan from. */
  private lazy val ivfIndexPath = s"$runDir/ivf_idx"
  private lazy val ivfCellsPath = s"$runDir/ivf_cells"

  /** Sidecars for the s_pq_search oracle: the fitted PQ layout (exploded
    * codes + true norms) and the query's ADC lookup table — the oracle
    * re-derives every candidate's ADC cosine and the top-k ordering from
    * the stored tables alone (the k-means fit itself has no SQL oracle,
    * same stance as s_ivf_search / s_kmeans). */
  private lazy val pqCodesPath = s"$runDir/pq_codes"
  private lazy val pqTablePath = s"$runDir/pq_table"
  private lazy val ivfCentroidsPath = s"$runDir/ivf_centroids"

  /** Sidecar for the m_image_decode oracle: generator-side EXPECTED image
    * metadata (dimensions by construction, mean luma from the raw pattern
    * before encoding). */
  private lazy val imageMetaPath = s"$runDir/image_meta"

  /** Sidecar for the m_audio_decode oracle: generator-side EXPECTED audio
    * metrics computed from the raw int16 samples before WAV encoding. */
  private lazy val audioMetaPath = s"$runDir/audio_meta"

  /** Sidecar for the m_video_decode oracle: generator-side EXPECTED
    * container metadata (dimensions, frame count and cadence by
    * construction — exact regardless of JPEG's lossy luma). */
  private lazy val videoMetaPath = s"$runDir/video_meta"

  /** Sidecar for the s_exact_search oracle: the candidate ids the exact
    * search's approximate probe produced (the oracle re-scores them
    * against the snapshot predicate instead of running the index). */
  private lazy val exactCandPath = s"$runDir/exact_cand"

  /** Sidecar for the s_kmeans oracle: the fitted (cell, centroid) pairs —
    * the oracle re-derives every row's argmin assignment and distance
    * from the stored centers alone. */
  private lazy val kmeansCentersPath = s"$runDir/kmeans_centers"

  /** Sidecars for the CDC oracles: each query persists ITS OWN chunk
    * table (the kernel is deterministic, so both copies are identical —
    * no cross-query ordering dependency). The oracle re-derives the
    * aggregate answer from the stored (doc_id, start, len, chunk_hash)
    * rows, and `d_cdc_chunks` additionally cross-checks the kernel's
    * character accounting against DuckDB's own length(text). */
  private lazy val cdcChunksPath = s"$runDir/cdc_chunks"
  private lazy val cdcSharePath = s"$runDir/cdc_share_chunks"
  private lazy val cdcCorpusPath = s"$runDir/cdc_corpus_chunks"
  private lazy val cdcBatchPath = s"$runDir/cdc_batch_chunks"

  /** Sidecars for the s_purged_search oracle: stored centroids + the
    * MODEL-derived cell assignment of the surviving snapshot (never read
    * from the purged layout itself — a leftover ghost must mismatch). */
  private lazy val purgedCellsPath = s"$runDir/purged_cells"
  private lazy val purgedCentroidsPath = s"$runDir/purged_centroids"

  /** Shared oracle WITH-prefix: per-doc 32-bit simhash as CTE `sh`
    * (consumed by d_simhash and d_simhash_pairs). */
  private val simhashCte =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
      |  FROM documents),
      |bits AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS i,
      |    ((strpos('0123456789abcdef', substr(md5(tok), CAST(i // 4 AS INTEGER) + 1, 1)) - 1)
      |      >> CAST(i % 4 AS INTEGER)) & 1 AS bit
      |  FROM toks, UNNEST(range(0, 32)) AS t(i)),
      |votes AS (
      |  SELECT doc_id, i, SUM(bit * 2 - 1) AS w FROM bits GROUP BY doc_id, i),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM votes GROUP BY doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup by full-text hash
    "d_exact_dedup" -> { (s, d) =>
      Dedup.exactDedup(docs(s, d), "doc_id", "text").orderBy("text_hash")
    },
    // canonical-form fingerprint dedup
    "d_fingerprint" -> { (s, d) =>
      Dedup.fingerprint(docs(s, d), "doc_id", "text").orderBy("doc_id")
    },
    // MinHash signatures (8 seeded hashes over 5-char shingles)
    "d_minhash_sig" -> { (s, d) =>
      Dedup.minHashSignatures(docs(s, d), "doc_id", "text", 5, 8)
        .orderBy("doc_id", "seed")
    },
    // MinHash + LSH banding candidate pairs
    "d_minhash_pairs" -> { (s, d) =>
      Dedup.minHashCandidatePairs(docs(s, d), "doc_id", "text", 5, 8, 2)
        .orderBy("id_a", "id_b")
    },
    // near-dup group labels: LSH candidate pairs -> connected components
    "d_dedup_groups" -> { (s, d) =>
      Dedup.dedupGroups(docs(s, d), "doc_id", "text", 5, 8, 2).orderBy("doc_id")
    },
    // best representative per near-dup group (labels persisted; see
    // dedupBestGroupsPath scaladoc for the verification chain)
    "d_dedup_best" -> { (s, d) =>
      Dedup.dedupCorpusBestVerified(docs(s, d), "doc_id", "text", "n_chars",
          5, 8, 2, dedupBestGroupsPath)
        .select("doc_id", "n_chars").orderBy("doc_id")
    },
    // content-defined chunking: Gear rolling-hash boundaries, per-doc
    // coverage cross-checked against DuckDB's length()
    "d_cdc_chunks" -> { (s, d) =>
      val chunks = Dedup.cdcChunks(docs(s, d), "doc_id", "text")
      chunks.write.mode("overwrite").parquet(cdcChunksPath)
      chunks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"), sum("len").as("covered"),
          max("len").as("max_len"))
        .orderBy("doc_id")
    },
    // chunk-level duplication ratio (shared-boilerplate signal): the
    // distributed hash-keyed aggregation re-derived by the oracle from
    // the stored chunk table
    "d_cdc_share" -> { (s, d) =>
      Dedup.cdcChunks(docs(s, d), "doc_id", "text")
        .write.mode("overwrite").parquet(cdcSharePath)
      Dedup.cdcDupRatio(docs(s, d), "doc_id", "text")
        .select("doc_id", "n_chunks", "n_chars", "dup_chars", "dup_ratio")
        .orderBy("doc_id")
    },
    // incremental chunk-level dedup: a new batch admitted against the
    // STORED corpus chunk table (corpus never re-chunked)
    "d_cdc_incremental" -> { (s, d) =>
      val all = docs(s, d)
      val corpus = all.filter(col("doc_id") % 5 =!= 0)
      val batch = all.filter(col("doc_id") % 5 === 0)
      Dedup.cdcChunks(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(cdcCorpusPath)
      Dedup.cdcChunks(batch, "doc_id", "text")
        .write.mode("overwrite").parquet(cdcBatchPath)
      Dedup.cdcDupRatioAgainst(batch, "doc_id", "text", cdcCorpusPath)
        .select("doc_id", "n_chunks", "n_chars", "dup_chars", "dup_ratio")
        .orderBy("doc_id")
    },
    // winnowing (rolling-hash window-min) fingerprints
    "d_winnowing" -> { (s, d) =>
      Dedup.winnowingFingerprints(docs(s, d), "doc_id", "text", 5, 4)
        .orderBy("doc_id", "fp")
    },
    // BPE-ish regex token counting (contractions, letter runs, digit runs,
    // punctuation runs — the GPT-2 pre-tokenizer shape)
    "x_bpe_tokens" -> { (s, d) =>
      docs(s, d).select(col("doc_id"),
          size(expr(
            """regexp_extract_all(text, "'(?:ll|ve|re|[sdmt])| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+", 0)"""))
            .as("n_bpe_tokens"))
        .orderBy("doc_id")
    },
    // LEARNED BPE: one corpus pass builds the piece dictionary, the merge
    // table trains driver-side over it (graft.operators.Tokenizer — the
    // merge choice itself is golden-pinned in TokenizerSpec; iterative
    // merge learning has no SQL oracle), then the encode kernel segments
    // every document. The oracle verifies the two SQL-expressible
    // invariants end-to-end: the pre-tokenization piece count, and
    // LOSSLESSNESS — concatenated BPE tokens must reproduce exactly the
    // concatenated regex pieces.
    "x_bpe_train" -> { (s, d) =>
      val dd = docs(s, d)
      val merges = graft.operators.Tokenizer.train(dd, "text",
        numMerges = 200, maxPieces = 4096)
      require(merges.size > 50, s"degenerate merge table: ${merges.size}")
      val enc = graft.operators.Tokenizer.encode(dd, "doc_id", "text", merges)
      val pieces = dd.select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit(graft.operators.Tokenizer.PiecePattern), lit(0))).as("n_pieces"))
      enc.withColumn("detok", concat_ws("", col("tokens")))
        .join(pieces, "doc_id")
        .select(col("doc_id"), col("n_pieces"), col("detok"))
        .orderBy("doc_id")
    },
    // 32-bit SimHash fingerprints
    "d_simhash" -> { (s, d) =>
      Dedup.simHash32(docs(s, d), "doc_id", "text").orderBy("doc_id")
    },
    // SimHash banded near-dup pairs (exact within hamming <= 3)
    "d_simhash_pairs" -> { (s, d) =>
      Dedup.simHashPairs(docs(s, d), "doc_id", "text", 3)
        .orderBy("id_a", "id_b")
    },
    // n-gram Jaccard similarity over bounded candidate pairs
    "d_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", "lang", 3, 20, 0.05)
        .orderBy("id_a", "id_b")
    },
    // brute-force cosine top-20 against the vec_id=0 embedding
    "s_knn" -> { (s, d) =>
      val e = emb(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      Similarity.cosineTopK(e, "vec_id", "embedding", q, 20)
    },
    // IVF ANN search over the persisted clustered layout; the oracle
    // re-derives probe selection (L2 to the stored centroids) and the
    // in-cell cosine top-k from the parquet sidecars
    "s_ivf_search" -> { (s, d) =>
      val e = emb(s, d)
      val (model, assigned) = IvfIndex.fit(e, "embedding", nLists = 8)
      IvfIndex.writeClustered(assigned, model, ivfIndexPath)
      assigned.select("vec_id", "ivf_cell")
        .write.mode("overwrite").parquet(ivfCellsPath)
      import s.implicits._
      model.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").parquet(ivfCentroidsPath)
      val q = e.filter(col("vec_id") === 0)
        .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS q")
        .as[Seq[Double]].head().toArray
      IvfIndex.searchClustered(s, ivfIndexPath, "vec_id", "embedding",
        q, 10, nProbe = 3)
    },
    // Product-quantization ADC search: fit m=8 sub-space codebooks (k=16),
    // encode every embedding to 8 int codes + its true norm, store the
    // exploded codes and the query's ADC table, and rank by approximate
    // cosine from the codes alone — the oracle re-derives the ADC sums,
    // the cosine division and the top-k ordering from the stored tables
    "s_pq_search" -> { (s, d) =>
      import s.implicits._
      val e = emb(s, d)
      // hash-sampled fit (the corpus-scale posture): codebooks converge on
      // a fraction of the rows; encode + search still cover every row
      val model = Pq.fit(e, "embedding", dim = 64, m = 8, k = 16,
        fitFraction = 0.2, maxIter = 8)
      val enc = Pq.encode(e, "embedding", model).cache()
      enc.select(col("vec_id"), posexplode(col("pq_codes")).as(Seq("m", "code")),
          col("pq_norm"))
        .write.mode("overwrite").parquet(pqCodesPath)
      val q = e.filter(col("vec_id") === 0)
        .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS q")
        .as[Seq[Double]].head().toArray
      // store the UNIT-query table — exactly what searchCosine sums
      // (codes quantize unit vectors, so the ADC sum IS the cosine)
      val qn = math.sqrt(q.map(x => x * x).sum)
      val table = Pq.distTable(model, q.map(_ / qn), "dot")
      table.zipWithIndex.flatMap { case (row, m) =>
        row.zipWithIndex.map { case (v, c) => (m, c, v) }
      }.toDF("m", "code", "val")
        .write.mode("overwrite").parquet(pqTablePath)
      Pq.searchCosine(enc, model, "vec_id", q, k = 10)
    },
    // EXACT current-snapshot search over a maintained (ghost-bearing)
    // vector index: revision 1 indexes every vector, revision 2 DELETES
    // vec_id % 7 = 0 (their vectors stay in the layout — the documented
    // append-only contract), and the query vector is a DELETED row's own
    // embedding. search(exact = true) must drop every ghost and re-rank
    // from the snapshot's current vectors. The oracle re-scores the
    // persisted candidate-id sidecar against the same snapshot predicate
    // — it never runs the index, so a ghost that leaks through the exact
    // path hash-mismatches
    "s_exact_search" -> { (s, d) =>
      import s.implicits._
      val p = java.nio.file.Files.createTempDirectory("graft-exactsearch")
        .toString + "/tbl"
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      graft.sources.TemporalTable.write(e, p)
      graft.sources.VectorIndex.create(s, p, "x", "vec_id", "embedding", nLists = 8)
      graft.sources.TemporalTable.write(e.filter(col("vec_id") % 7 =!= 0), p)
      graft.sources.VectorIndex.maintain(s, p, "x")
      val q = e.filter(col("vec_id") === 0)
        .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS q")
        .as[Seq[Double]].head().toArray
      // persist the same candidate set the exact path overfetches (same
      // deterministic probe: k·overfetch = 40, nProbe = 3)
      graft.operators.IvfIndex.searchClustered(s, s"$p/_vecidx/x", "vec_id",
        "embedding", q, 40, nProbe = 3).select("vec_id")
        .write.mode("overwrite").parquet(exactCandPath)
      graft.sources.VectorIndex.search(s, p, "x", q, k = 10, nProbe = 3,
        exact = true, overfetch = 4)
    },
    // RAW approximate search over a PURGED index: revision 2 deletes
    // vec_id % 7 = 0, purge physically compacts the ghosts out, and the
    // plain (non-exact) probe must already be ghost-free. The oracle
    // re-derives probe + in-cell top-k from centroid/assignment sidecars
    // computed from the MODEL and the surviving snapshot — a ghost left
    // in the layout mismatches
    "s_purged_search" -> { (s, d) =>
      import s.implicits._
      val p = java.nio.file.Files.createTempDirectory("graft-purgesearch")
        .toString + "/tbl"
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      graft.sources.TemporalTable.write(e, p)
      graft.sources.VectorIndex.create(s, p, "x", "vec_id", "embedding", nLists = 8)
      graft.sources.TemporalTable.write(e.filter(col("vec_id") % 7 =!= 0), p)
      graft.sources.VectorIndex.purge(s, p, "x")
      val model = IvfIndex.readModel(s"$p/_vecidx/x")
      model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").parquet(purgedCentroidsPath)
      IvfIndex.assignCells(
          e.filter(col("vec_id") % 7 =!= 0)
            .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding"),
          model, "embedding")
        .select(col("vec_id"), col("ivf_cell"))
        .write.mode("overwrite").parquet(purgedCellsPath)
      val q = e.filter(col("vec_id") === 0)
        .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS q")
        .as[Seq[Double]].head().toArray
      IvfIndex.searchClustered(s, s"$p/_vecidx/x", "vec_id", "embedding",
        q, 10, nProbe = 3)
    },
    // embedding near-duplicate pairs within a label
    "s_neardup_embed" -> { (s, d) =>
      Similarity.nearDupPairs(emb(s, d), "vec_id", "embedding", "label", 0.8)
        .orderBy("id_a", "id_b")
    },
    // all-pairs kNN join (brute-force baseline; IVF variant is spec-tested)
    "s_knn_join" -> { (s, d) =>
      Similarity.knnJoin(emb(s, d), "vec_id", "embedding", 3)
        .orderBy("id_a", "rank")
    },
    // int8 scalar quantization codes (vector compression for ANN at scale)
    "s_quantize" -> { (s, d) =>
      val e = emb(s, d)
      val bounds = Quantize.fitBounds(e, "embedding")
      Quantize.encode(e, "vec_id", "embedding", bounds)
        .select(col("vec_id"),
          expr("concat_ws(',', transform(codes, c -> CAST(c AS STRING)))").as("codes"))
        .orderBy("vec_id")
    },
    // REAL image decode (JDK ImageIO, no external codecs): 48 deterministic
    // grayscale patterns are PNG-encoded on executors, decoded back by the
    // partition-local kernel, and the decoded width/height/mean-luma are
    // checked against the GENERATOR's expected metadata (written as a
    // parquet sidecar before any encode happened — the oracle never runs
    // the decoder). PNG is lossless and both sides sum the same BT.601
    // luma in the same pixel order, so the match is exact at 4 decimals.
    "m_image_decode" -> { (s, d) =>
      import s.implicits._
      val imageSpecs = (0 until 48).map(i => (i.toLong, 16 + (i % 13), 12 + (i % 7)))
      def pix(id: Long, x: Int, y: Int): Int = ((x * 7 + y * 13 + id) % 256).toInt
      val expected = imageSpecs.map { case (id, w, h) =>
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = pix(id, x, y)
            sum += 0.299 * v + 0.587 * v + 0.114 * v
            x += 1
          }
          y += 1
        }
        val mean = java.math.BigDecimal.valueOf(sum / (w.toLong * h))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        (id, w, h, mean)
      }
      expected.toDF("media_id", "width", "height", "mean_luma")
        .coalesce(1).write.mode("overwrite").parquet(imageMetaPath)
      val media = s.createDataset(imageSpecs).map { case (id, w, h) =>
        graft.operators.Multimodal.MediaRecord(id, "image",
          graft.operators.Multimodal.encodeGrayPng(w, h, (x, y) => pix(id, x, y)),
          "image/png", -1, -1, 0L)
      }
      graft.operators.Multimodal.extractFeatures(media)
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_luma"), 4).as("mean_luma"))
        .orderBy("media_id")
    },

    // REAL WAV decode through javax.sound.sampled: per-clip duration /
    // RMS / zero-crossing rate from true PCM samples, checked against the
    // GENERATOR's expected metrics (computed from the raw int16 samples
    // BEFORE the WAV bytes existed — the oracle never runs the decoder).
    // WAV PCM is lossless and both sides use the same /32768 norm and
    // sign-flip count, so the match is exact at 4 decimals.
    "m_audio_decode" -> { (s, d) =>
      import s.implicits._
      val clipSpecs = (0 until 32).map { i =>
        (i.toLong, 2000 + (i % 5) * 400, 100.0 + i * 37.0, 0.2 + (i % 4) * 0.15)
      }
      val rate = 8000
      def synth(n: Int, freq: Double, amp: Double): Array[Short] =
        Array.tabulate(n)(j =>
          (amp * 32767.0 * math.sin(2 * math.Pi * freq * j / rate)).toShort)
      def r4(v: Double): Double = java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      val expected = clipSpecs.map { case (id, n, freq, amp) =>
        val mono = synth(n, freq, amp).map(_ / 32768.0)
        val rms = math.sqrt(mono.map(x => x * x).sum / mono.length)
        val flips = mono.sliding(2).count(p => (p(1) > 0) != (p(0) > 0))
        (id, rate, 1, math.round(n * 1000.0 / rate),
          r4(rms), r4(flips.toDouble / (mono.length - 1)))
      }
      expected.toDF("media_id", "sample_rate", "channels", "duration_ms",
          "rms", "zero_cross_rate")
        .coalesce(1).write.mode("overwrite").parquet(audioMetaPath)
      val media = s.createDataset(clipSpecs).map { case (id, n, freq, amp) =>
        graft.operators.Multimodal.MediaRecord(id, "audio",
          graft.operators.Multimodal.encodePcmWav(rate, synth(n, freq, amp)),
          "audio/wav", -1, -1, 0L)
      }
      graft.operators.Multimodal.extractAudioFeatures(media)
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("duration_ms"), round(col("rms"), 4).as("rms"),
          round(col("zero_cross_rate"), 4).as("zero_cross_rate"))
        .orderBy("media_id")
    },
    // REAL Motion-JPEG AVI decode: deterministic gradient clips, exact
    // container metadata (dimensions / frame count / cadence) against the
    // generator-side oracle; per-frame luma is JPEG-lossy and therefore
    // spec-pinned with tolerance, not oracle-hashed. Every third clip is
    // hostile bytes — the decoder column proves the stub fallback fires
    // instead of failing the partition.
    "m_video_decode" -> { (s, d) =>
      import s.implicits._
      val clipSpecs = (0 until 24).map { i =>
        (i.toLong, 16 + (i % 4) * 8, 12 + (i % 3) * 4, 4 + (i % 6), i % 3 == 2)
      }
      val fps = 8
      val expected = clipSpecs.map { case (id, w, h, nf, hostile) =>
        if (hostile) (id, -1, -1, -1, -1L, "stub")
        else (id, w, h, nf, (1000000 / fps).toLong * nf / 1000L, "mjpeg")
      }
      expected.toDF("media_id", "width", "height", "n_frames", "duration_ms",
          "decoder")
        .coalesce(1).write.mode("overwrite").parquet(videoMetaPath)
      val media = s.createDataset(clipSpecs).map { case (id, w, h, nf, hostile) =>
        val payload =
          if (hostile) Array.tabulate[Byte](48)(j => ((id * 31 + j * 7) % 251).toByte)
          else graft.operators.Multimodal.encodeMjpegAvi(w, h, fps,
            (0 until nf).map(k => (x: Int, y: Int) => (x * 11 + y * 3 + k * 29 + id.toInt) % 256))
        graft.operators.Multimodal.MediaRecord(id, "video", payload,
          "video/x-msvideo", -1, -1, 0L)
      }
      graft.operators.Multimodal.extractVideoFeatures(media)
        .select(col("media_id"), col("width"), col("height"), col("n_frames"),
          col("duration_ms"), col("decoder"))
        .orderBy("media_id")
    },

    // corpus TF-IDF: top-3 most characteristic words per doc
    "x_tfidf" -> { (s, d) =>
      Corpus.tfidfTopTerms(docs(s, d), "doc_id", "text", 3)
        .orderBy("doc_id", "rank")
    },
    // corpus-self char-bigram LM quality score (CCNet-style filter proxy)
    "x_lm_score" -> { (s, d) =>
      Corpus.charBigramLmScore(docs(s, d), "doc_id", "text").orderBy("doc_id")
    },
    // CCNet head/middle/tail split over the self-trained LM score
    "x_ccnet_buckets" -> { (s, d) =>
      val scored = Corpus.charBigramLmScore(docs(s, d), "doc_id", "text")
        .select("doc_id", "lm_score")
      Corpus.perplexityBuckets(scored, "lm_score", 3)
        .select(col("doc_id"), col("lm_score"),
          when(col("bucket") === 3, "head")
            .when(col("bucket") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    },
    // DSIR importance weights against a target slice of the corpus
    "x_dsir" -> { (s, d) =>
      val all = docs(s, d)
      Corpus.importanceWeights(all,
          all.filter(col("source").isin("src0", "src1", "src2")),
          "doc_id", "text")
        .orderBy("doc_id")
    },
    // corpus composition report by source × lang
    "x_source_mix" -> { (s, d) =>
      Corpus.sourceMix(docs(s, d), "text", Seq("source", "lang"))
        .orderBy("source", "lang")
    },
    // language-ID heuristic vs the labeled lang column
    "x_lang_id" -> { (s, d) =>
      docs(s, d).select(col("doc_id"), col("lang"),
          TextFunctions.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")
    },
    // quality metrics + composite score
    "x_quality" -> { (s, d) =>
      val m = TextFunctions.qualityMetrics(col("text"))
      docs(s, d).select(
          col("doc_id") +: m.map { case (n, c) => c.as(n) } :+
            TextFunctions.qualityScore(col("text")).as("quality"): _*)
        .orderBy("doc_id")
    },
    // token counting
    "x_token_count" -> { (s, d) =>
      docs(s, d).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    },
    // Gopher-style repetition quality filters
    "x_repetition" -> { (s, d) =>
      Corpus.repetitionMetrics(docs(s, d), "doc_id", "text").orderBy("doc_id")
    },
    // C4-style corpus-level duplicate-span fractions (8-word grams)
    "d_span_dedup" -> { (s, d) =>
      Corpus.spanDedup(docs(s, d), "doc_id", "text", 8).orderBy("doc_id")
    },
    // benchmark-contamination 3-gram overlap (benchmark = doc_id % 50 == 0)
    "x_contamination" -> { (s, d) =>
      val all = docs(s, d)
      Corpus.contamination(all.filter(col("doc_id") % 50 =!= 0),
          all.filter(col("doc_id") % 50 === 0), "doc_id", "text", 3)
        .orderBy("doc_id")
    },
    // bloom-prefiltered contamination (the at-broadcast-scale variant:
    // bloom prune map-side, exact shuffle semi-join confirm — output
    // identical to the exact join by construction; benchmark = % 40)
    "x_contamination_scale" -> { (s, d) =>
      val all = docs(s, d)
      Corpus.contaminationAtScale(all.filter(col("doc_id") % 40 =!= 0),
          all.filter(col("doc_id") % 40 === 0), "doc_id", "text", 3)
        .orderBy("doc_id")
    },
    // exact heavy hitters via Misra-Gries candidates + exact confirm
    // (tokens with > 1/64 of all occurrences)
    "x_heavy_hitters" -> { (s, d) =>
      Corpus.heavyHitters(docs(s, d), "doc_id", "text", 64)
    },
    // k-means clustering over embeddings (fit + argmin assignment +
    // distance); the oracle re-derives every assignment from the stored
    // centers sidecar alone
    "s_kmeans" -> { (s, d) =>
      val e = emb(s, d)
      val (model, _) = IvfIndex.fit(e, "embedding", nLists = 6)
      import s.implicits._
      model.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").parquet(kmeansCentersPath)
      IvfIndex.assignCellsWithDistance(e, model, "embedding")
        .select(col("vec_id"), col("cluster"), col("dist"))
        .orderBy("vec_id")
    },
    // sliding-window chunking (32-word windows, 8-word overlap)
    "x_chunk" -> { (s, d) =>
      Corpus.chunk(docs(s, d), "doc_id", "text", 32, 8)
        .orderBy("doc_id", "chunk_id")
    },
    // deterministic hash-stratified sampling by language
    "x_sample_stratified" -> { (s, d) =>
      Corpus.stratifiedSample(docs(s, d), "doc_id", "lang",
          Map("en" -> 0.5, "es" -> 0.25, "fr" -> 0.25, "de" -> 0.125),
          defaultRate = 0.0625)
        .select("doc_id", "lang").orderBy("doc_id")
    },
    // sequence packing: docs -> fixed 512-token training packs, 8 shards
    "x_pack" -> { (s, d) =>
      Corpus.packSequences(docs(s, d), "doc_id", "text", 512, 8)
        .orderBy("doc_id")
    },
    // curation funnel: per-stage attrition report (first failing stage)
    "x_funnel" -> { (s, d) =>
      Corpus.curationFunnel(docs(s, d), "doc_id", "text").orderBy("stage")
    },
    // URL-level dedup on canonicalized synthetic URLs (scheme/www/fragment/
    // tracking-param/slash variants collapse; host lowercased, path not)
    "d_url_dedup" -> { (s, d) =>
      val id = col("doc_id")
      val url = concat(
        when(id % 2 === 0, "HTTP://").otherwise("https://"),
        when(id % 3 === 0, "WWW.").otherwise(lit("")),
        lit("Site"), (id % 7).cast("string"), lit(".com/Path/"),
        (id % 50).cast("string"),
        when(id % 2 === 0, "/").otherwise(lit("")),
        lit("?utm_source=feed&fbclid=x"), id.cast("string"),
        lit("&id="), (id % 5).cast("string"),
        when(id % 4 === 0, "#frag").otherwise(lit("")))
      docs(s, d).select(id, TextFunctions.canonicalizeUrl(url).as("canon_url"))
        .groupBy("canon_url")
        .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("canon_url")
    },
    // domain-rebalancing sampling rates toward a target language mix
    "x_mix_weights" -> { (s, d) =>
      Corpus.mixWeights(docs(s, d), "lang",
          Map("en" -> 0.7, "es" -> 0.1, "fr" -> 0.1, "de" -> 0.1))
        .orderBy("lang")
    },
    // incremental dedup: admit batch docs (doc_id % 10 = 0) that near-dup
    // neither the stored corpus (doc_id % 10 != 0) nor a smaller-id batch doc
    "d_incremental_dedup" -> { (s, d) =>
      val all = docs(s, d)
      val corpusBands = Dedup.bandBuckets(
        all.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 5, 8, 2)
      Dedup.incrementalDedup(all.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", corpusBands, 5, 8, 2)
        .select("doc_id").orderBy("doc_id")
    },
    // mix-rate application: deterministic up/down-sampling to a target mix,
    // repeats tagged with an epoch column
    "x_mix_apply" -> { (s, d) =>
      Corpus.applyMixRates(docs(s, d), "doc_id", "lang",
          Map("en" -> 1.5, "es" -> 0.75, "fr" -> 2.0, "de" -> 0.25),
          defaultRate = 1.0)
        .select("doc_id", "lang", "epoch").orderBy("doc_id", "epoch")
    },
    // deterministic training-order shuffle: seeded (shard, pos) addresses
    "x_shuffle" -> { (s, d) =>
      Corpus.trainingOrder(docs(s, d), "doc_id", seed = 42, nShards = 8)
        .select("doc_id", "shard", "pos").orderBy("shard", "pos")
    },
    // fastText-style linear classifier scoring against a fixed weight table
    "x_classifier" -> { (s, d) =>
      import s.implicits._
      val weights = Seq(
        ("the", 0.5), ("and", 0.5), ("of", 0.25),
        ("table", -0.5), ("spam", -2.0), ("value", -0.25)).toDF("term", "weight")
      Corpus.classifierScore(docs(s, d), "doc_id", "text", weights, bias = 0.125)
        .orderBy("doc_id")
    },
    // SemDeDup: IVF-cell-bounded cosine groups over embeddings. The k-means
    // fit is not SQL-expressible, so the query persists its deterministic
    // cell assignment to a sidecar and computes the labels FROM the stored
    // sidecar — the oracle replays the within-cell grouping over the same
    // parquet (fit semantics stay pinned by DedupSimilaritySpec).
    "s_semantic_dedup" -> { (s, d) =>
      Similarity.semanticDedupVerified(emb(s, d), "vec_id", "embedding", 8, 0.95,
          semDedupCellsPath)
        .orderBy("vec_id")
    },
    // PII scrubbing + whitespace normalization (training-data hygiene);
    // deterministic synthetic PII is injected per doc so the kernels are
    // exercised on every row
    "x_scrub" -> { (s, d) =>
      docs(s, d).select(col("doc_id"),
          TextFunctions.scrubPii(concat(
            lit("contact user"), col("doc_id"), lit("@example.com or http://ex.com/"),
            col("doc_id"), lit(" ip 10.0.0.1 call +1 (555) 000-1234 :: "),
            substring(col("text"), 1, 50))).as("scrubbed"),
          TextFunctions.normalizeWhitespace(substring(col("text"), 1, 80)).as("norm"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    // decoded-vs-expected over the generator's sidecar: the oracle reads
    // what the pattern generator STORED (pre-encode); the Spark side is
    // what ImageIO DECODED from the PNG bytes — a decoder bug (wrong
    // dims, wrong channel order, wrong luma) breaks the hash match
    "m_image_decode" ->
      s"""SELECT media_id, width, height, mean_luma
         |FROM read_parquet('$imageMetaPath/*.parquet')
         |ORDER BY media_id""".stripMargin,
    "m_audio_decode" ->
      s"""SELECT media_id, sample_rate, channels, duration_ms, rms, zero_cross_rate
         |FROM read_parquet('$audioMetaPath/*.parquet')
         |ORDER BY media_id""".stripMargin,
    "m_video_decode" ->
      s"""SELECT media_id, width, height, n_frames, duration_ms, decoder
         |FROM read_parquet('$videoMetaPath/*.parquet')
         |ORDER BY media_id""".stripMargin,
    "s_pq_search" ->
      s"""WITH codes AS (
         |  SELECT * FROM read_parquet('$pqCodesPath/*.parquet')),
         |tbl AS (
         |  SELECT * FROM read_parquet('$pqTablePath/*.parquet')),
         |scored AS (
         |  SELECT c.vec_id, ROUND(SUM(t.val), 4) AS sim
         |  FROM codes c JOIN tbl t ON t.m = c.m AND t.code = c.code
         |  WHERE c.pq_norm > 0
         |  GROUP BY c.vec_id)
         |SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "d_exact_dedup" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,
    "d_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_minhash_sig" ->
      """WITH shingles AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 5) AS sh
        |  FROM documents, UNNEST(range(1, length(text) - 3)) AS t(i)
        |  WHERE length(text) >= 5)
        |SELECT doc_id, CAST(seed AS INTEGER) AS seed,
        |  MIN(substr(md5(sh), CAST(4 * seed + 1 AS INTEGER))
        |      || substr(md5(sh), 1, CAST(4 * seed AS INTEGER))) AS sig
        |FROM shingles, UNNEST(range(0, 8)) AS s(seed)
        |GROUP BY doc_id, seed ORDER BY doc_id, seed""".stripMargin,
    "d_minhash_pairs" ->
      ("WITH " + PipelineOracleSql.minhashPairsCtes +
        "\nSELECT id_a, id_b FROM pairs ORDER BY id_a, id_b"),
    // selection over the STORED labels; d_dedup_groups pins the labels
    "d_dedup_best" ->
      s"""WITH g AS (
        |  SELECT * FROM read_parquet('$dedupBestGroupsPath/*.parquet')),
        |r AS (
        |  SELECT d.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY g.group_id
        |                       ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM documents d JOIN g USING (doc_id))
        |SELECT doc_id, n_chars FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "d_dedup_groups" ->
      ("WITH RECURSIVE " + PipelineOracleSql.minhashPairsCtes + ",\n" +
        """edges AS (
          |  SELECT id_a AS u, id_b AS v FROM pairs
          |  UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
          |reach(id, r) AS (
          |  SELECT doc_id, doc_id FROM documents
          |  UNION
          |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r)
          |SELECT id AS doc_id, MIN(r) AS group_id
          |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),
    "d_cdc_chunks" ->
      s"""SELECT c.doc_id, c.n_chunks, c.covered, c.max_len
        |FROM (SELECT doc_id, COUNT(*) AS n_chunks,
        |        CAST(SUM(len) AS BIGINT) AS covered,
        |        MAX(len) AS max_len
        |      FROM read_parquet('$cdcChunksPath/*.parquet')
        |      GROUP BY doc_id) c
        |JOIN documents d USING (doc_id)
        |WHERE c.covered = length(d.text)
        |ORDER BY c.doc_id""".stripMargin,
    "d_cdc_share" ->
      s"""WITH ch AS (SELECT * FROM read_parquet('$cdcSharePath/*.parquet')),
        |h AS (SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs
        |      FROM ch GROUP BY chunk_hash)
        |SELECT ch.doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(ch.len) AS BIGINT) AS n_chars,
        |  CAST(COALESCE(SUM(CASE WHEN h.n_docs > 1 THEN ch.len END), 0) AS BIGINT)
        |    AS dup_chars,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN h.n_docs > 1 THEN ch.len END), 0)
        |      AS DOUBLE) / SUM(ch.len), 4) AS dup_ratio
        |FROM ch JOIN h USING (chunk_hash)
        |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin,
    "d_cdc_incremental" ->
      s"""WITH b AS (SELECT * FROM read_parquet('$cdcBatchPath/*.parquet')),
        |c AS (SELECT DISTINCT chunk_hash
        |      FROM read_parquet('$cdcCorpusPath/*.parquet'))
        |SELECT b.doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(b.len) AS BIGINT) AS n_chars,
        |  CAST(COALESCE(SUM(CASE WHEN c.chunk_hash IS NOT NULL THEN b.len END), 0)
        |    AS BIGINT) AS dup_chars,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN c.chunk_hash IS NOT NULL THEN b.len END), 0)
        |      AS DOUBLE) / SUM(b.len), 4) AS dup_ratio
        |FROM b LEFT JOIN c USING (chunk_hash)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "d_winnowing" ->
      """WITH hashed AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos, md5(substr(text, CAST(i AS INTEGER), 5)) AS h
        |  FROM documents, UNNEST(range(1, length(text) - 3)) AS t(i)
        |  WHERE length(text) >= 5)
        |SELECT DISTINCT doc_id,
        |  MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |FROM hashed ORDER BY doc_id, fp""".stripMargin,
    "x_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '''(?:ll|ve|re|[sdmt])| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS INTEGER) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_bpe_train" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '(?:''(?:ll|ve|re|[sdmt]))| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS INTEGER) AS n_pieces,
        |  array_to_string(regexp_extract_all(text, '(?:''(?:ll|ve|re|[sdmt]))| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'), '') AS detok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_simhash" ->
      (simhashCte + "\nSELECT doc_id, simhash FROM sh ORDER BY doc_id"),
    "d_simhash_pairs" ->
      (simhashCte + "\n" +
        """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          |ORDER BY id_a, id_b""".stripMargin),
    "d_ngram_jaccard" ->
      """WITH grams AS (
        |  SELECT DISTINCT doc_id, lang, substr(text, CAST(i AS INTEGER), 3) AS g
        |  FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)
        |  WHERE length(text) >= 3),
        |counts AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.lang = b.lang AND a.g = b.g
        |  WHERE a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 20
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        |  ROUND(CAST(n_inter AS DOUBLE) / (ca.n_grams + cb.n_grams - n_inter), 4) AS jaccard
        |FROM inter
        |JOIN counts ca ON ca.doc_id = id_a
        |JOIN counts cb ON cb.doc_id = id_b
        |WHERE CAST(n_inter AS DOUBLE) / (ca.n_grams + cb.n_grams - n_inter) >= 0.05
        |ORDER BY id_a, id_b""".stripMargin,
    // probe ties break on cell (Model.nearestCentroids' stable sort);
    // scoring matches s_knn's cosine/round/tie conventions
    "s_ivf_search" ->
      s"""WITH cent AS (
        |  SELECT * FROM read_parquet('$ivfCentroidsPath/*.parquet')),
        |cells AS (
        |  SELECT * FROM read_parquet('$ivfCellsPath/*.parquet')),
        |q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |probes AS (
        |  SELECT cell FROM cent, q
        |  ORDER BY list_distance(centroid, qv), cell LIMIT 3),
        |scored AS (
        |  SELECT e.vec_id,
        |    ROUND(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)), qv), 4) AS sim
        |  FROM embeddings e JOIN cells c USING (vec_id), q
        |  WHERE c.ivf_cell IN (SELECT cell FROM probes))
        |SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "s_purged_search" ->
      s"""WITH cent AS (
        |  SELECT * FROM read_parquet('$purgedCentroidsPath/*.parquet')),
        |cells AS (
        |  SELECT * FROM read_parquet('$purgedCellsPath/*.parquet')),
        |q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |probes AS (
        |  SELECT cell FROM cent, q
        |  ORDER BY list_distance(centroid, qv), cell LIMIT 3),
        |scored AS (
        |  SELECT e.vec_id,
        |    ROUND(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)), qv), 4) AS sim
        |  FROM embeddings e JOIN cells c USING (vec_id), q
        |  WHERE c.ivf_cell IN (SELECT cell FROM probes))
        |SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "s_exact_search" ->
      s"""WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |cand AS (
        |  SELECT DISTINCT vec_id FROM read_parquet('$exactCandPath/*.parquet')),
        |scored AS (
        |  SELECT e.vec_id,
        |    ROUND(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)), qv), 4) AS sim
        |  FROM embeddings e JOIN cand USING (vec_id), q
        |  WHERE e.vec_id % 7 <> 0)
        |SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "s_knn" ->
      """WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    ROUND(
        |      list_cosine_similarity(
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |        list_transform(qvec, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings, q)
        |SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin,
    // Replays the grouping over the persisted cell-assignment sidecar the
    // Spark query wrote (the fit itself is spec-pinned, not oracle-checked).
    "s_semantic_dedup" ->
      s"""WITH RECURSIVE cells AS (
        |  SELECT * FROM read_parquet('$semDedupCellsPath/*.parquet')),
        |j AS (
        |  SELECT e.vec_id, c.ivf_cell, e.embedding
        |  FROM embeddings e JOIN cells c USING (vec_id)),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM j a JOIN j b ON a.ivf_cell = b.ivf_cell AND a.vec_id < b.vec_id
        |  WHERE ROUND(list_cosine_similarity(
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) >= 0.95),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r)
        |SELECT id AS vec_id, MIN(r) AS group_id, (MIN(r) = id) AS keep
        |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,
    "s_neardup_embed" ->
      """WITH scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    ROUND(
        |      list_cosine_similarity(
        |        list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |        list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "s_knn_join" ->
      """WITH s AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    ROUND(list_cosine_similarity(
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY sim DESC, id_b) AS rn
        |  FROM s)
        |SELECT id_a, id_b, sim, CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 3 ORDER BY id_a, rank""".stripMargin,
    "s_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(i AS INTEGER) AS i, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        |b AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY i),
        |c AS (
        |  SELECT vec_id, e.i,
        |    CASE WHEN mx = mn THEN 0
        |         ELSE CAST(ROUND((x - mn) / (mx - mn) * 255) AS BIGINT) END AS code
        |  FROM e JOIN b ON b.i = e.i)
        |SELECT vec_id, string_agg(code::VARCHAR, ',' ORDER BY i) AS codes
        |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "x_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 4) AS tfidf
        |  FROM tf JOIN dfreq ON dfreq.term = tf.term, n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, term, tfidf, CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    // same lm_score derivation as x_lm_score; quantile_cont matches
    // Stats.quantiles' interpolation (R-7), both rounded to 4dp before
    // the strict-> comparison chain, so boundary ties agree
    "x_ccnet_buckets" ->
      """WITH grams AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS g
        |  FROM documents, UNNEST(range(1, length(text))) AS t(i)
        |  WHERE length(text) >= 2),
        |bi AS (SELECT g, COUNT(*) AS cnt2 FROM grams GROUP BY g),
        |uni AS (
        |  SELECT substr(g, 1, 1) AS c1, COUNT(*) AS cnt1
        |  FROM grams GROUP BY substr(g, 1, 1)),
        |probs AS (
        |  SELECT g, ROUND(ln(CAST(cnt2 AS DOUBLE) / cnt1), 6) AS lp
        |  FROM bi JOIN uni ON uni.c1 = substr(bi.g, 1, 1)),
        |scored AS (
        |  SELECT doc_id,
        |    ROUND(CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS lm_score
        |  FROM grams JOIN probs USING (g) GROUP BY doc_id),
        |b AS (
        |  SELECT ROUND(quantile_cont(lm_score, 1.0/3), 4) AS b1,
        |         ROUND(quantile_cont(lm_score, 2.0/3), 4) AS b2
        |  FROM scored)
        |SELECT doc_id, lm_score,
        |  CASE WHEN lm_score > b2 THEN 'head'
        |       WHEN lm_score > b1 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM scored, b ORDER BY doc_id""".stripMargin,
    // instance-level decimal fold == Spark's histogram-level sum(lr·cnt)
    // (decimal × integer is exact); COUNT(*) avoids the HUGEINT SUM trap
    "x_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
        |  FROM documents),
        |corpus AS (SELECT w, COUNT(*) AS ccnt FROM toks GROUP BY w),
        |ctot AS (SELECT COUNT(*) AS c FROM toks),
        |ttoks AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
        |tgt AS (SELECT w, COUNT(*) AS tcnt FROM ttoks GROUP BY w),
        |ttot AS (SELECT COUNT(*) AS t FROM ttoks),
        |lr AS (
        |  SELECT corpus.w,
        |    ROUND(ln((CAST(COALESCE(tgt.tcnt, 0) + 1 AS DOUBLE) * (ctot.c + 1)) /
        |             (CAST(corpus.ccnt + 1 AS DOUBLE) * (ttot.t + 1))), 6) AS lr
        |  FROM corpus LEFT JOIN tgt ON tgt.w = corpus.w, ctot, ttot)
        |SELECT toks.doc_id, COUNT(*) AS n_words,
        |  ROUND(CAST(SUM(CAST(lr.lr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS dsir_weight
        |FROM toks JOIN lr USING (w)
        |GROUP BY toks.doc_id ORDER BY toks.doc_id""".stripMargin,
    "x_lm_score" ->
      """WITH grams AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS g
        |  FROM documents, UNNEST(range(1, length(text))) AS t(i)
        |  WHERE length(text) >= 2),
        |bi AS (SELECT g, COUNT(*) AS cnt2 FROM grams GROUP BY g),
        |uni AS (
        |  SELECT substr(g, 1, 1) AS c1, COUNT(*) AS cnt1
        |  FROM grams GROUP BY substr(g, 1, 1)),
        |probs AS (
        |  SELECT g, ROUND(ln(CAST(cnt2 AS DOUBLE) / cnt1), 6) AS lp
        |  FROM bi JOIN uni ON uni.c1 = substr(bi.g, 1, 1)),
        |scored AS (
        |  SELECT doc_id, SUM(CAST(lp AS DECIMAL(18,6))) AS slp, COUNT(*) AS n
        |  FROM grams JOIN probs USING (g) GROUP BY doc_id)
        |SELECT doc_id, ROUND(CAST(slp AS DOUBLE) / n, 4) AS lm_score, n AS n_bigrams
        |FROM scored ORDER BY doc_id""".stripMargin,
    "x_source_mix" ->
      """WITH per_doc AS (
        |  SELECT source, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS nw,
        |    CAST(length(text) AS BIGINT) AS nc
        |  FROM documents),
        |agg AS (
        |  SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(nw) AS BIGINT) AS n_words,
        |    ROUND(AVG(nc), 4) AS avg_chars
        |  FROM per_doc GROUP BY source, lang)
        |SELECT source, lang, n_docs, n_words, avg_chars,
        |  ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 4) AS doc_share
        |FROM agg ORDER BY source, lang""".stripMargin,
    "x_lang_id" -> PipelineOracleSql.langIdSql,
    "x_quality" -> PipelineOracleSql.qualitySql,
    "x_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS INTEGER) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_repetition" ->
      """WITH wl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(w) AS w FROM wl),
        |counts AS (SELECT doc_id, w, COUNT(*) AS cnt FROM toks GROUP BY doc_id, w),
        |top AS (
        |  SELECT doc_id, w AS top_word, cnt AS top_cnt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, w) AS rn
        |  FROM counts),
        |grams AS (
        |  SELECT doc_id, w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1] AS g
        |  FROM wl, UNNEST(range(1, len(w))) AS r(i)),
        |g2 AS (
        |  SELECT doc_id, COUNT(*) AS n_2grams, COUNT(DISTINCT g) AS n_distinct
        |  FROM grams GROUP BY doc_id),
        |m AS (
        |  SELECT wl.doc_id, CAST(len(wl.w) AS BIGINT) AS n_words, top.top_word,
        |    ROUND(CAST(top.top_cnt AS DOUBLE) / len(wl.w), 4) AS top_word_frac,
        |    ROUND(1.0 - CAST(g2.n_distinct AS DOUBLE) / g2.n_2grams, 4) AS dup_2gram_frac
        |  FROM wl
        |  LEFT JOIN top ON top.doc_id = wl.doc_id AND top.rn = 1
        |  LEFT JOIN g2 ON g2.doc_id = wl.doc_id)
        |SELECT doc_id, n_words, top_word, top_word_frac, dup_2gram_frac,
        |  (COALESCE(top_word_frac > 0.2, false)
        |    OR COALESCE(dup_2gram_frac > 0.2, false)) AS rep_flagged
        |FROM m ORDER BY doc_id""".stripMargin,
    "d_span_dedup" ->
      """WITH wl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    md5(array_to_string(w[CAST(i AS INTEGER):CAST(i AS INTEGER) + 7], ' ')) AS h
        |  FROM wl, UNNEST(range(1, len(w) - 6)) AS r(i)),
        |marked AS (
        |  SELECT doc_id,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        |  FROM spans)
        |SELECT doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |  ROUND(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
        |    AS dup_span_frac
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_contamination" ->
      """WITH wl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(w[CAST(i AS INTEGER):CAST(i AS INTEGER) + 2], ' ')) AS h
        |  FROM wl, UNNEST(range(1, len(w) - 1)) AS r(i)),
        |ov AS (
        |  SELECT doc_id, COUNT(*) AS n_overlap FROM grams
        |  WHERE doc_id % 50 != 0
        |    AND h IN (SELECT h FROM grams WHERE doc_id % 50 = 0)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
        |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
        |LEFT JOIN ov ON ov.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // exact twin of the bloom-prefiltered plan: the bloom only prunes,
    // the exact semi-join decides — so the oracle is the plain overlap join
    "x_contamination_scale" ->
      """WITH wl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(w[CAST(i AS INTEGER):CAST(i AS INTEGER) + 2], ' ')) AS h
        |  FROM wl, UNNEST(range(1, len(w) - 1)) AS r(i)),
        |ov AS (
        |  SELECT doc_id, COUNT(*) AS n_overlap FROM grams
        |  WHERE doc_id % 40 != 0
        |    AND h IN (SELECT h FROM grams WHERE doc_id % 40 = 0)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
        |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 40 != 0) d
        |LEFT JOIN ov ON ov.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "x_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
        |  FROM documents),
        |tot AS (SELECT COUNT(*) AS n FROM toks)
        |SELECT token, COUNT(*) AS freq FROM toks, tot
        |GROUP BY token, tot.n HAVING COUNT(*) * 64 > tot.n
        |ORDER BY freq DESC, token""".stripMargin,
    // assignment + distance re-derived purely from the stored centers:
    // same argmin, same (dist, cell) tie-break, same rounding convention
    "s_kmeans" ->
      s"""WITH cent AS (
        |  SELECT * FROM read_parquet('$kmeansCentersPath/*.parquet')),
        |a AS (
        |  SELECT e.vec_id, c.cell,
        |    list_distance(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |      c.centroid) AS dist,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(
        |        list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |        c.centroid), c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c)
        |SELECT vec_id, CAST(cell AS INTEGER) AS cluster, ROUND(dist, 4) AS dist
        |FROM a WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "x_chunk" ->
      """WITH wl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, w, CAST(s AS INTEGER) AS start,
        |    CAST(s AS INTEGER) // 24 AS chunk_id
        |  FROM wl, UNNEST(range(0, greatest(1, len(w) - 8), 24)) AS r(s)
        |  WHERE len(w) > 0)
        |SELECT doc_id, chunk_id,
        |  array_to_string(w[start + 1:start + 32], ' ') AS chunk_text,
        |  CAST(least(32, len(w) - start) AS BIGINT) AS n_chunk_words
        |FROM starts ORDER BY doc_id, chunk_id""".stripMargin,
    "x_sample_stratified" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1)
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, lang FROM b
        |WHERE bucket < CASE lang WHEN 'en' THEN 2048 WHEN 'es' THEN 1024
        |  WHEN 'fr' THEN 1024 WHEN 'de' THEN 512 ELSE 256 END
        |ORDER BY doc_id""".stripMargin,
    "x_pack" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM t)
        |SELECT doc_id, shard, CAST(cum // 512 AS BIGINT) AS pack_id, n_tokens,
        |  CAST(cum % 512 AS BIGINT) AS pack_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "x_funnel" -> PipelineOracleSql.funnelSql,
    "x_mix_weights" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |s AS (
        |  SELECT lang, n_docs,
        |    CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS cur,
        |    CAST(CASE lang WHEN 'en' THEN 0.7 WHEN 'es' THEN 0.1
        |      WHEN 'fr' THEN 0.1 WHEN 'de' THEN 0.1 ELSE 0.0 END AS DOUBLE)
        |      AS target_share
        |  FROM c),
        |w AS (SELECT *, target_share / cur AS wt FROM s)
        |SELECT lang, n_docs, ROUND(cur, 4) AS current_share, target_share,
        |  ROUND(wt / MAX(wt) OVER (), 4) AS sample_rate
        |FROM w ORDER BY lang""".stripMargin,
    "d_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    'Site' || (doc_id % 7) || '.com/Path/' || (doc_id % 50) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
        |    '?utm_source=feed&fbclid=x' || doc_id || '&id=' || (doc_id % 5) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS x FROM u),
        |s2 AS (SELECT doc_id,
        |  regexp_replace(x, '^[hH][tT][tT][pP][sS]?://', '', 'g') AS x FROM s1),
        |s3 AS (SELECT doc_id,
        |  regexp_replace(lower(regexp_extract(x, '^[^/?#]*')), '^www\.', '', 'g') AS host,
        |  regexp_replace(x, '^[^/?#]*', '') AS rest FROM s2),
        |s4 AS (SELECT doc_id, host,
        |  regexp_replace(rest, '([?&])(utm_[a-z0-9_]+|fbclid|gclid|ref)=[^&]*', '\1', 'g') AS rest
        |  FROM s3),
        |s4b AS (SELECT doc_id, host,
        |  regexp_replace(regexp_replace(rest, '&&+', '&', 'g'), '\?&', '?', 'g') AS rest
        |  FROM s4),
        |s5 AS (SELECT doc_id, host,
        |  regexp_replace(rest, '[?&]+$', '', 'g') AS rest FROM s4b),
        |s6 AS (SELECT doc_id, host,
        |  regexp_replace(regexp_replace(rest, '/\?', '?', 'g'), '/$', '', 'g') AS rest
        |  FROM s5),
        |c AS (SELECT doc_id, host || rest AS canon_url FROM s6)
        |SELECT canon_url, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin,
    "d_incremental_dedup" ->
      ("WITH " + PipelineOracleSql.minhashPairsCtes + """,
        |hit_corpus AS (
        |  SELECT DISTINCT a.doc_id FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0),
        |hit_batch AS (
        |  SELECT DISTINCT a.doc_id FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 = 0 AND b.doc_id < a.doc_id)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 10 = 0
        |  AND doc_id NOT IN (SELECT doc_id FROM hit_corpus)
        |  AND doc_id NOT IN (SELECT doc_id FROM hit_batch)
        |ORDER BY doc_id""".stripMargin),
    "x_mix_apply" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1)
        |      AS bucket,
        |    CASE lang WHEN 'en' THEN 1.5 WHEN 'es' THEN 0.75
        |      WHEN 'fr' THEN 2.0 WHEN 'de' THEN 0.25 ELSE 1.0 END AS rate
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang,
        |    CAST(FLOOR(rate) AS BIGINT)
        |      + CASE WHEN bucket < ROUND((rate - FLOOR(rate)) * 4096, 0)
        |             THEN 1 ELSE 0 END AS n
        |  FROM b)
        |SELECT doc_id, lang, CAST(e AS INTEGER) AS epoch
        |FROM c, UNNEST(range(0, n)) AS t(e)
        |ORDER BY doc_id, epoch""".stripMargin,
    "x_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, sk,
        |    CAST(((strpos('0123456789abcdef', substr(sk, 1, 1)) - 1) * 1048576
        |        + (strpos('0123456789abcdef', substr(sk, 2, 1)) - 1) * 65536
        |        + (strpos('0123456789abcdef', substr(sk, 3, 1)) - 1) * 4096
        |        + (strpos('0123456789abcdef', substr(sk, 4, 1)) - 1) * 256
        |        + (strpos('0123456789abcdef', substr(sk, 5, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(sk, 6, 1)) - 1)) % 8
        |      AS INTEGER) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sk, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "x_classifier" ->
      """WITH w(term, weight) AS (VALUES
        |  ('the', 0.5), ('and', 0.5), ('of', 0.25),
        |  ('table', -0.5), ('spam', -2.0), ('value', -0.25)),
        |tc AS (
        |  SELECT doc_id, tok AS term, COUNT(*) AS cnt
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_terms,
        |    SUM(CAST(cnt * COALESCE(w.weight, 0.0) AS DECIMAL(28,10))) AS dot
        |  FROM tc LEFT JOIN w ON tc.term = w.term
        |  GROUP BY doc_id)
        |SELECT doc_id, n_terms,
        |  ROUND(0.125 + CAST(dot AS DOUBLE) / n_terms, 4) AS margin
        |FROM agg ORDER BY doc_id""".stripMargin,
    "x_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    'contact user' || doc_id || '@example.com or http://ex.com/' || doc_id ||
        |      ' ip 10.0.0.1 call +1 (555) 000-1234 :: ' || substr(text, 1, 50),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed,
        |  trim(regexp_replace(substr(text, 1, 80), '\s+', ' ', 'g')) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

/** The longer text-analysis oracles, kept separate for readability. The SQL
  * mirrors [[graft.functions.TextFunctions]] construct by construct. */
object PipelineOracleSql {

  /** Shared MinHash→LSH CTE chain (shingles → sigs → bands → pairs),
    * mirroring [[graft.operators.Dedup.minHashCandidatePairs]] construct by
    * construct; consumed by both the d_minhash_pairs and d_dedup_groups
    * oracles so the two can never drift apart. */
  val minhashPairsCtes: String =
    """shingles AS (
      |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 5) AS sh
      |  FROM documents, UNNEST(range(1, length(text) - 3)) AS t(i)
      |  WHERE length(text) >= 5),
      |sigs AS (
      |  SELECT doc_id, CAST(seed AS INTEGER) AS seed,
      |    MIN(substr(md5(sh), CAST(4 * seed + 1 AS INTEGER))
      |        || substr(md5(sh), 1, CAST(4 * seed AS INTEGER))) AS sig
      |  FROM shingles, UNNEST(range(0, 8)) AS s(seed)
      |  GROUP BY doc_id, seed),
      |bands AS (
      |  SELECT doc_id, seed // 2 AS band,
      |    md5(string_agg(lpad(seed::VARCHAR, 2, '0') || sig, '' ORDER BY seed)) AS band_key
      |  FROM sigs GROUP BY doc_id, seed // 2),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      |  WHERE a.doc_id < b.doc_id)""".stripMargin

  /** occurrences(tok) = (len(text) - len(replace(text, tok, ''))) / len(tok) */
  private def occ(tok: String): String = {
    val esc = tok.replace("'", "''")
    s"CAST((length(text) - length(replace(text, '$esc', ''))) / ${tok.length} AS BIGINT)"
  }

  private def hits(toks: Seq[String]): String = toks.map(occ).mkString(" + ")

  // must match TextFunctions.langMarkers
  private val en = hits(Seq(" the ", " and ", " of "))
  private val es = hits(Seq(" el ", " la ", " que "))
  private val fr = hits(Seq(" le ", " les ", " et "))
  private val de = hits(Seq(" der ", " und ", " die "))

  val langIdSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $en AS h_en, $es AS h_es, $fr AS h_fr, $de AS h_de
       |  FROM documents)
       |SELECT doc_id, lang,
       |  CASE
       |    WHEN h_de > 0 AND h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
       |    WHEN h_en > 0 AND h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
       |    WHEN h_es > 0 AND h_es >= h_de AND h_es >= h_en AND h_es >= h_fr THEN 'es'
       |    WHEN h_fr > 0 AND h_fr >= h_de AND h_fr >= h_en AND h_fr >= h_es THEN 'fr'
       |    ELSE 'und' END AS pred_lang
       |FROM scored ORDER BY doc_id""".stripMargin

  private val punct = hits(Seq(".", ",", "!", "?", ";", ":"))

  /** Curation-funnel oracle: mirrors [[graft.operators.Corpus.curationFunnel]]
    * — the quality-metric CTE (same expressions as [[qualitySql]]), the
    * lang-ID CASE (same as [[langIdSql]]), and the repetition flags (same
    * as the x_repetition oracle), composed into a first-failing-stage
    * attribution. */
  val funnelSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE) AS n_nonspace,
       |    $en AS h_en, $es AS h_es, $fr AS h_fr, $de AS h_de
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, n_chars, ROUND(n_nonspace / n_words, 4) AS awl,
       |    CASE
       |      WHEN h_de > 0 AND h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
       |      WHEN h_en > 0 AND h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
       |      WHEN h_es > 0 AND h_es >= h_de AND h_es >= h_en AND h_es >= h_fr THEN 'es'
       |      WHEN h_fr > 0 AND h_fr >= h_de AND h_fr >= h_en AND h_fr >= h_es THEN 'fr'
       |      ELSE 'und' END AS pred_lang
       |  FROM m),
       |wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
       |  FROM documents),
       |toks AS (SELECT doc_id, unnest(w) AS w FROM wl),
       |counts AS (SELECT doc_id, w, COUNT(*) AS cnt FROM toks GROUP BY doc_id, w),
       |top AS (
       |  SELECT doc_id, cnt AS top_cnt,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, w) AS rn
       |  FROM counts),
       |grams AS (
       |  SELECT doc_id, w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1] AS g
       |  FROM wl, UNNEST(range(1, len(w))) AS r(i)),
       |g2 AS (
       |  SELECT doc_id, COUNT(*) AS n_2grams, COUNT(DISTINCT g) AS n_distinct
       |  FROM grams GROUP BY doc_id),
       |rep AS (
       |  SELECT wl.doc_id,
       |    (COALESCE(ROUND(CAST(top.top_cnt AS DOUBLE) / len(wl.w), 4) > 0.2, false)
       |      OR COALESCE(ROUND(1.0 - CAST(g2.n_distinct AS DOUBLE) / g2.n_2grams, 4) > 0.2, false))
       |      AS rep_flagged
       |  FROM wl
       |  LEFT JOIN top ON top.doc_id = wl.doc_id AND top.rn = 1
       |  LEFT JOIN g2 ON g2.doc_id = wl.doc_id),
       |staged AS (
       |  SELECT q.doc_id,
       |    CASE
       |      WHEN NOT (n_chars BETWEEN 100 AND 10000) THEN '1_length'
       |      WHEN NOT (awl BETWEEN 3.0 AND 12.0) THEN '2_word_len'
       |      WHEN pred_lang = 'und' THEN '3_lang'
       |      WHEN rep_flagged THEN '4_repetition'
       |      ELSE '0_kept' END AS stage
       |  FROM q LEFT JOIN rep ON rep.doc_id = q.doc_id)
       |SELECT stage, COUNT(*) AS n_docs,
       |  ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 4) AS doc_share
       |FROM staged GROUP BY stage ORDER BY stage""".stripMargin

  val qualitySql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE) AS n_nonspace,
       |    CAST($punct AS DOUBLE) AS n_punct,
       |    CAST($en AS DOUBLE) AS n_stop
       |  FROM documents)
       |SELECT doc_id, n_chars, n_words,
       |  ROUND(n_nonspace / n_words, 4) AS avg_word_len,
       |  ROUND(n_punct / n_chars, 4) AS punct_ratio,
       |  ROUND(n_stop / n_words, 4) AS stop_ratio,
       |  (CASE WHEN n_chars BETWEEN 100 AND 10000 THEN 0.5 ELSE 0.0 END +
       |   CASE WHEN ROUND(n_nonspace / n_words, 4) BETWEEN 3.0 AND 12.0 THEN 0.5 ELSE 0.0 END)
       |    AS quality
       |FROM m ORDER BY doc_id""".stripMargin
}
