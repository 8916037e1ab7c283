package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * All kernels are codegen'd expressions (built-ins plus the native
  * one-pass kernels in [[graft.functions.MinHashExpressions]] — no Scala
  * UDFs); every hash is md5 over UTF-8, chosen because it is bit-identical
  * across engines (differential-testable against DuckDB) and deterministic
  * across the cluster. The shapes are shuffle-minimal: signature and
  * fingerprint generation is entirely map-side (one kernel pass per
  * document), so the only shuffles in the candidate paths are the
  * band-bucket joins themselves, each partitioned by a high-cardinality
  * key.
  *
  * Id-keyed operators assume ONE ROW PER DOCUMENT (ids unique) — the
  * invariant every downstream join/label relies on. Inputs with repeated
  * ids should be exact-deduped first.
  */
object Dedup {

  /** Exact dedup: representative (min id) + multiplicity per identical text.
    * One hash-shuffle on the text hash — never on the full text at scale
    * (group key is md5(text), 32 bytes, not the document body). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Canonical fingerprint: md5 of lowercased text with all non-alphanumerics
    * stripped (catches whitespace/punctuation-only edits). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"))

  /** Spread a narrow input across the cluster before a heavy map-side
    * expansion (explode × hash). Small document tables often arrive as one
    * or two parquet splits — without this every downstream shingle/hash
    * runs on a single task. At scale inputs already have many splits and
    * this is a no-op. */
  private[operators] def fanOut(df: DataFrame, idCol: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(idCol)) else df
  }

  /** Character k-shingles, exploded: (id, sh). Documents shorter than k drop
    * out (they have no shingle). Map-side only after the fan-out. */
  def charShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    fanOut(df.filter(length(col(textCol)) >= k), idCol)
      .select(col(idCol),
        explode(expr(s"transform(sequence(1, length($textCol) - ${k - 1}), i -> substring($textCol, i, $k))")).as("sh"))

  /** Wide per-doc MinHash signatures — (id, sig_0 .. sig_{n-1}) — computed
    * ENTIRELY map-side by the native
    * [[graft.functions.MinHashExpressions.minHashSigs]] kernel: one JIT'd
    * pass per document digests every k-shingle once and folds the n
    * rotated-hex minima in place. No Generate of the shingle stream, no
    * per-partition sort, no aggregate, no exchange — at corpus scale the
    * signature stage costs exactly one codegen'd pass over the text
    * splits. The kernel's byte-wise minimum uses the same binary
    * lexicographic ordering as the `min` aggregate, so results are
    * bit-identical to the exploded-aggregate formulation (differential
    * HOF twin in the spec) and to the DuckDB oracle's GROUP BY MIN. */
  private[operators] def wideSignatures(df: DataFrame, idCol: String,
                                        textCol: String, shingleLen: Int,
                                        numHashes: Int): DataFrame = {
    require(numHashes >= 1 && numHashes <= 8, "numHashes must be in 1..8")
    val sigs = graft.functions.MinHashExpressions.minHashSigs(
      col(textCol), shingleLen, numHashes)
    fanOut(df.filter(length(col(textCol)) >= shingleLen), idCol)
      .select(col(idCol), sigs.as("__sigs"))
      .select(col(idCol) +:
        (0 until numHashes).map(i => element_at(col("__sigs"), i + 1).as(s"sig_$i")): _*)
  }

  /** MinHash signatures as (id, seed, sig) rows, via the one-hash trick:
    * hash function `seed` is the digest rotated by 4·seed hex chars (md5
    * bits are independent, so rotations act as distinct hash functions —
    * max 8 seeds at rotation step 4). The min is over the hex string
    * (lexicographic = byte order), identical in every engine. The whole
    * computation is one map-side pass ([[wideSignatures]]) plus an
    * unpivot. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int, numHashes: Int): DataFrame = {
    val stackArgs = (0 until numHashes).map(i => s"$i, sig_$i").mkString(", ")
    wideSignatures(df, idCol, textCol, shingleLen, numHashes)
      .select(col(idCol),
        expr(s"stack($numHashes, $stackArgs)").as(Seq("seed", "sig")))
  }

  /** LSH banding: hash `bandSize` consecutive signature components per band;
    * docs sharing a (band, band_key) bucket are near-duplicate candidates.
    * Band keys are computed per-row from [[wideSignatures]] — the whole
    * band table is ONE map-side pass over the text (no aggregate, no
    * exchange); the only shuffle in the candidate path is the band-bucket
    * join itself, which explodes only where true near-dups cluster (the
    * LSH guarantee). Key bytes are identical to the former
    * sorted-collect_list aggregate (seeds zero-padded, concatenated in
    * seed order). */
  private[operators] def lshBands(df: DataFrame, idCol: String, textCol: String,
                                  shingleLen: Int, numHashes: Int,
                                  bandSize: Int): DataFrame = {
    require(bandSize >= 1 && numHashes % bandSize == 0,
      s"bandSize ($bandSize) must be >= 1 and divide numHashes ($numHashes) — " +
        "a short final band would inflate its collision probability past " +
        "the r-band/b-row LSH model")
    val wide = wideSignatures(df, idCol, textCol, shingleLen, numHashes)
    val bandStructs = (0 until numHashes).groupBy(_ / bandSize).toSeq
      .sortBy(_._1).map { case (b, seeds) =>
        val keyParts = seeds.sorted.flatMap(s =>
          Seq(lit(f"$s%02d"), col(s"sig_$s")))
        struct(lit(b.toLong).as("band"),
          md5(concat(keyParts: _*)).as("band_key"))
      }
    wide.select(col(idCol), explode(array(bandStructs: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"),
        col("__b.band_key").as("band_key"))
  }

  /** [[lshBands]] as a public surface: the (id, band, band_key) bucket
    * table. At 100 TB compute this ONCE and persist it (a self-join over a
    * lazy plan evaluates the whole shingle→signature pipeline twice —
    * once per side); [[candidatePairsFromBands]] then joins from storage. */
  def bandBuckets(df: DataFrame, idCol: String, textCol: String,
                  shingleLen: Int = 5, numHashes: Int = 8,
                  bandSize: Int = 2): DataFrame =
    lshBands(df, idCol, textCol, shingleLen, numHashes, bandSize)

  /** Candidate pairs from a precomputed [[bandBuckets]] table (read it
    * back from parquet to avoid the double signature computation). */
  def candidatePairsFromBands(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  def minHashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            shingleLen: Int = 5, numHashes: Int = 8,
                            bandSize: Int = 2): DataFrame =
    // pin: the self-join consumes the band table twice, and a lazy plan
    // would run the whole shingle→signature pipeline once per side
    candidatePairsFromBands(Graphs.pinLocal(
      lshBands(df, idCol, textCol, shingleLen, numHashes, bandSize)), idCol)

  /** Winnowing document fingerprints (the MOSS scheme): hash every
    * k-gram, then keep the minimum hash of each sliding window of `w`
    * consecutive k-grams — guarantees any match of length ≥ w+k−1 shares a
    * fingerprint, with ~2/(w+1) selection density. The whole selection
    * runs in one kernel pass per document
    * ([[graft.functions.MinHashExpressions.winnowingPrints]]). */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 5, w: Int = 4): DataFrame =
    // one-pass kernel per doc: no gram explode, no doc-keyed window
    // shuffle, and no distinct — the kernel emits each doc's prints
    // already deduplicated, so (id, fp) rows are unique by construction
    // and the whole operator is map-side
    fanOut(df.filter(length(col(textCol)) >= k), idCol)
      .select(col(idCol),
        explode(graft.functions.MinHashExpressions.winnowingPrints(
          col(textCol), k, w)).as("fp"))

  /** 32-bit SimHash over whitespace tokens. Bit i of md5(token) is nibble
    * i/4, bit i%4; the fingerprint sets bit i where the signed vote across
    * tokens is positive. Computed by the one-pass codegen'd kernel
    * ([[graft.functions.MinHashExpressions.simHash32]]) — a single
    * map-side pass per document, no token explode, no (id, bit)-keyed
    * shuffle. Tokenless docs drop (same as the exploded formulation). */
  def simHash32(df: DataFrame, idCol: String, textCol: String): DataFrame =
    fanOut(df, idCol)
      .select(col(idCol),
        graft.functions.MinHashExpressions.simHash32(col(textCol)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash near-duplicate pairs — the fingerprint-side counterpart of
    * [[minHashCandidatePairs]] (Manku et al., WWW'07, adapted from 64- to
    * our 32-bit [[simHash32]]): two fingerprints within hamming distance
    * `maxHamming` must agree on at least one of `maxHamming + 1` disjoint
    * bit-bands (pigeonhole), so candidate generation is an equi-join on
    * (band, band bits) — never all-pairs — and the exact `bit_count(xor)`
    * check runs only inside buckets, making the result EXACT: every
    * qualifying pair, no false positives. The explode is 4 rows/doc and
    * all kernels are codegen'd built-ins; a degenerate band value shared
    * by many fingerprints (e.g. all-zeros) is a skew key the same way an
    * LSH bucket is — AQE's skew split covers it. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame =
    // pin: the band self-join reads the fingerprints twice
    simHashPairsFrom(Graphs.pinLocal(simHash32(df, idCol, textCol)), idCol, maxHamming)

  /** [[simHashPairs]] over a precomputed (id, simhash) fingerprint table —
    * at 100 TB persist [[simHash32]]'s output once and pair from storage,
    * instead of re-tokenizing the corpus on both sides of the self-join. */
  def simHashPairsFrom(fingerprints: DataFrame, idCol: String,
                       maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    require(nBands >= 1 && 32 % nBands == 0,
      s"maxHamming + 1 (= $nBands) must divide 32")
    val width = 32 / nBands
    val mask = (1L << width) - 1
    val banded = fingerprints
      .select(col(idCol), col("simhash"),
        explode(expr(s"sequence(0, ${nBands - 1})")).as("band"))
      .withColumn("band_bits",
        expr(s"shiftright(simhash, CAST(band * $width AS INT)) & $mask"))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("__fa"),
      col("band"), col("band_bits"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("__fb"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(__fa ^ __fb) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** End-to-end near-duplicate GROUP assignment: MinHash→LSH candidate
    * pairs ([[minHashCandidatePairs]]) fed through distributed connected
    * components ([[Graphs.componentLabels]]); every document labels itself
    * with the smallest doc id transitively reachable through the candidate
    * graph (documents with no near-dup label themselves). Downstream dedup
    * is then a single `filter(id = group_id)` — the representative-per-
    * cluster selection every production pipeline needs after pair
    * generation, computed without ever materializing a cluster in one
    * task's memory. */
  def dedupGroups(df: DataFrame, idCol: String, textCol: String,
                  shingleLen: Int = 5, numHashes: Int = 8,
                  bandSize: Int = 2): DataFrame = {
    // bucket-STAR edges, not the pairwise clique: every bucket member
    // connects to its bucket's min id. Connectivity is identical (a clique
    // and its star have the same transitive closure) but a hot bucket of k
    // boilerplate near-dups contributes k−1 edges instead of k(k−1)/2 —
    // the candidate join that [[minHashCandidatePairs]] must do to ENUMERATE
    // pairs is exactly what group assignment can skip.
    //
    // The band table feeds two consumers (the per-bucket roots aggregate
    // and the member join); pin it so the shingle→signature pipeline — the
    // dominant cost — is evaluated once, not once per consumer.
    val bands = Graphs.pinLocal(
      lshBands(df, idCol, textCol, shingleLen, numHashes, bandSize))
    val roots = bands.groupBy("band", "band_key").agg(min(col(idCol)).as("__root"))
    val starEdges = bands.join(roots, Seq("band", "band_key"))
      .filter(col(idCol) =!= col("__root"))
      .select(col(idCol).as("id_a"), col("__root").as("id_b"))
      .distinct()
    val labels = Graphs.componentLabels(df.select(col(idCol)), idCol,
      starEdges, "id_a", "id_b")
    // componentLabels eagerly materializes the edge set (its first pin), so
    // the band blocks are consumed by the time it returns — release them
    Graphs.unpin(bands)
    labels.withColumnRenamed("component", "group_id")
  }

  /** The deduplicated corpus: keep exactly one representative (the min-id
    * member) per [[dedupGroups]] near-duplicate group, all columns
    * preserved. */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
                  shingleLen: Int = 5, numHashes: Int = 8,
                  bandSize: Int = 2): DataFrame = {
    val groups = dedupGroups(df, idCol, textCol, shingleLen, numHashes, bandSize)
    df.join(groups.filter(col(idCol) === col("group_id")).select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  /** Incremental (batch-vs-corpus) near-dup candidates: which docs of a
    * NEW batch near-duplicate an EXISTING corpus, as an asymmetric join of
    * the batch's band table against the corpus's STORED band table
    * ([[bandBuckets]] persisted once at ingest). This is the daily-ingest
    * pattern at 100 TB — the corpus side is never re-shingled, only its
    * (id, band, band_key) bucket table is read, and the join shuffles
    * 32-byte band keys, never text. Returns distinct (batch_id,
    * corpus_id). */
  def incrementalCandidatePairs(batchBands: DataFrame, corpusBands: DataFrame,
                                idCol: String): DataFrame = {
    val a = batchBands.select(col(idCol).as("batch_id"),
      col("band"), col("band_key"))
    val b = corpusBands.select(col(idCol).as("corpus_id"),
      col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .select("batch_id", "corpus_id").distinct()
  }

  /** Incremental dedup ADMIT set: the rows of `batch` that (a) are not
    * near-duplicates of the existing corpus (via
    * [[incrementalCandidatePairs]] against its stored band table) and
    * (b) are not near-duplicates of a smaller-id batch doc (PAIRWISE, not
    * transitive — two batch docs that only share a neighbor both stay;
    * whole-corpus transitive closure is [[dedupCorpus]]'s job). The
    * batch's bands are computed once (pinned) and feed both the corpus
    * join and the in-batch join; both anti-joins are keyed by the doc id. */
  def incrementalDedup(batch: DataFrame, idCol: String, textCol: String,
                       corpusBands: DataFrame, shingleLen: Int = 5,
                       numHashes: Int = 8, bandSize: Int = 2): DataFrame = {
    val bands = Graphs.pinLocal(
      lshBands(batch, idCol, textCol, shingleLen, numHashes, bandSize))
    // the two REJECT id-sets are materialized eagerly (they are tiny —
    // bounded by the batch), which severs their lineage from the band
    // table so its pinned blocks can be released here instead of
    // accumulating in executor storage for the life of the session
    val vsCorpus = incrementalCandidatePairs(bands, corpusBands, idCol)
      .select(col("batch_id").as(idCol)).distinct().localCheckpoint(true)
    val inBatch = candidatePairsFromBands(bands, idCol)
      .select(col("id_b").as(idCol)).distinct().localCheckpoint(true)
    Graphs.unpin(bands)
    batch.join(vsCorpus, Seq(idCol), "left_anti")
      .join(inBatch, Seq(idCol), "left_anti")
  }

  /** [[dedupCorpus]] with caller-chosen representatives: keep the group
    * member maximizing `scoreCol` (ties → smallest id) instead of the
    * smallest id — production pipelines keep the highest-QUALITY member of
    * a near-dup cluster (longest, best LM score), not the first-crawled
    * one. Costs one extra group-keyed aggregate over the
    * [[dedupGroups]] labels; the text column still never shuffles. */
  def dedupCorpusBest(df: DataFrame, idCol: String, textCol: String,
                      scoreCol: String, shingleLen: Int = 5,
                      numHashes: Int = 8, bandSize: Int = 2): DataFrame =
    bestFromGroups(df, idCol, scoreCol,
      dedupGroups(df, idCol, textCol, shingleLen, numHashes, bandSize))

  /** [[dedupCorpusBest]] with the group labels PERSISTED to
    * `sidecarPath` and the selection computed over the stored table —
    * the oracle chain: `d_dedup_groups` pins the labels themselves
    * cell-for-cell, and this pins the best-representative selection over
    * exactly the labels Spark stored (the
    * [[Similarity.semanticDedupVerified]] pattern). */
  def dedupCorpusBestVerified(df: DataFrame, idCol: String, textCol: String,
                              scoreCol: String, shingleLen: Int,
                              numHashes: Int, bandSize: Int,
                              sidecarPath: String): DataFrame = {
    dedupGroups(df, idCol, textCol, shingleLen, numHashes, bandSize)
      .write.mode("overwrite").parquet(sidecarPath)
    bestFromGroups(df, idCol, scoreCol,
      df.sparkSession.read.parquet(sidecarPath))
  }

  /** Best representative per dedup group: rank-within-group rather than
    * max(struct(score, -id)) — negation would assume a numeric id, but
    * ids may be strings (same contract as dedupGroups). Groups are tiny,
    * so the per-group window is safe. */
  private def bestFromGroups(df: DataFrame, idCol: String, scoreCol: String,
                             groups: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("group_id").orderBy(col(scoreCol).desc, col(idCol).asc)
    val keep = df.select(col(idCol), col(scoreCol))
      .join(groups, Seq(idCol))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** n-gram Jaccard similarity over candidate pairs. Candidates are bounded
    * by an equality `groupCol` (shuffle key) and an id-distance window. The
    * window is enforced IN the join key, not post-hoc: side A joins on its
    * id-band `id div W`, side B is emitted under both its own band and the
    * previous one (any pair with 0 < id_b − id_a ≤ W spans at most adjacent
    * bands), so match enumeration — not just output — is bounded by the
    * window and the join never goes quadratic in a gram's frequency. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, n: Int = 3, idWindow: Long = 20,
                        minJaccard: Double = 0.0): DataFrame = {
    require(idWindow >= 1, s"idWindow must be >= 1, got $idWindow")
    require(Set("long", "int", "bigint", "integer", "smallint", "tinyint")(
        df.schema(idCol).dataType.simpleString),
      s"ngramJaccardPairs bands on integral id arithmetic (id div window); " +
        s"'$idCol' is ${df.schema(idCol).dataType.simpleString} — assign a " +
        "numeric surrogate id first (string ids are supported by " +
        "minHashCandidatePairs/dedupGroups, not by the windowed bander)")

    // pin: the distinct gram table feeds three consumers (per-doc counts +
    // both join sides) — evaluate the explode + distinct once
    val grams = Graphs.pinLocal(df.filter(length(col(textCol)) >= n)
      .select(col(idCol), col(groupCol),
        explode(expr(s"transform(sequence(1, length($textCol) - ${n - 1}), i -> substring($textCol, i, $n))")).as("g"))
      .distinct())
    // counts is consumed by both the na and nb joins — pin the (tiny,
    // doc-cardinality) rollup so the gram table isn't re-aggregated twice
    val counts = Graphs.pinLocal(
      grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams")))
    val a = grams.select(col(idCol).as("id_a"), col(groupCol).as("grp"), col("g"))
      .withColumn("band", expr(s"id_a div $idWindow"))
    val b = grams.select(col(idCol).as("id_b"), col(groupCol).as("grp"), col("g"))
      .withColumn("band", explode(array(
        expr(s"id_b div $idWindow"), expr(s"id_b div $idWindow - 1"))))
    val inter = a.join(b, Seq("grp", "g", "band"))
      .filter(col("id_a") < col("id_b") && col("id_b") - col("id_a") <= idWindow)
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(counts.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Content-defined chunks of every document, exploded: (id, chunk_id,
    * start, len, chunk_hash) — boundaries from the Gear rolling hash
    * ([[graft.functions.CdcExpressions]]), so an edited document
    * re-synchronizes within one chunk and the untouched remainder keeps
    * its hashes (the fixed-window chunker's shift problem solved).
    * start/len are CHARACTER offsets: `substring(text, start+1, len)` is
    * the chunk, and `chunk_hash = xxhash64(that substring)` — both
    * spec-pinned. Entirely map-side (one kernel pass + posexplode); text
    * never shuffles. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                avgBits: Int = 6, minChars: Int = 16,
                maxChars: Int = 256): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.CdcExpressions.cdcChunks(
          col(textCol), avgBits, minChars, maxChars))
          .as(Seq("chunk_id", "__c")))
      .select(col(idCol), col("chunk_id"),
        col("__c.start").as("start"), col("__c.len").as("len"),
        col("__c.hash").as("chunk_hash"))

  /** Per-document chunk-level duplication: how much of each document's
    * content (chunks, weighted by length) also appears — byte-identical —
    * in at least one OTHER document. The "shared boilerplate" curation
    * signal CDC exists for: headers, licence blocks, templated sections
    * surface even when no document-level near-dup fires.
    *
    * Plan: ONE kernel pass → chunk frame; a `chunk_hash`-partitioned
    * window marks hashes held by more than one distinct doc (min ≠ max
    * of the holder id — no self-join, so the expensive map-side chunking
    * runs once, not once per plan subtree); per-doc weighted rollup.
    * Both shuffles key on high-cardinality columns and carry 8-byte
    * hashes, never text; at 100 TB the chunk-hash exchange is the dedup
    * working set, ~corpus/2^avgBits rows. */
  def cdcDupRatio(df: DataFrame, idCol: String, textCol: String,
                  avgBits: Int = 6, minChars: Int = 16,
                  maxChars: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = cdcChunks(df, idCol, textCol, avgBits, minChars, maxChars)
    val perHash = Window.partitionBy("chunk_hash")
    chunks
      .withColumn("__multi",
        min(col(idCol)).over(perHash) =!= max(col(idCol)).over(perHash))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("len")).as("n_chars"),
        sum(when(col("__multi"), col("len")).otherwise(0L)).as("dup_chars"))
      .withColumn("dup_ratio",
        round(col("dup_chars").cast("double") / col("n_chars"), 4))
  }

  /** Incremental chunk-level duplication: how much of each NEW document
    * already exists — byte-identical at chunk granularity — in a stored
    * corpus chunk table ([[cdcChunks]] output persisted as parquet). The
    * daily-ingest admission pattern, mirroring [[incrementalDedup]]: the
    * corpus is never re-chunked; only its (8-byte) hash column is read,
    * distinct-reduced, and hash-joined against the batch's chunks. Same
    * parameters as the stored table or the hashes won't line up. */
  def cdcDupRatioAgainst(newBatch: DataFrame, idCol: String, textCol: String,
                         corpusChunksPath: String,
                         avgBits: Int = 6, minChars: Int = 16,
                         maxChars: Int = 256): DataFrame = {
    val chunks = cdcChunks(newBatch, idCol, textCol, avgBits, minChars, maxChars)
    val corpus = newBatch.sparkSession.read.parquet(corpusChunksPath)
      .select(col("chunk_hash")).distinct()
      .withColumn("__hit", lit(1))
    chunks.join(corpus, Seq("chunk_hash"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("len")).as("n_chars"),
        sum(when(col("__hit") === 1, col("len")).otherwise(0L)).as("dup_chars"))
      .withColumn("dup_ratio",
        round(col("dup_chars").cast("double") / col("n_chars"), 4))
  }
}
