package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data curation operators (builder brief: the
  * operations a large-scale LLM data pipeline needs beyond the reference's
  * own surface): repetition quality filters, cross-document span
  * deduplication, benchmark-contamination detection, and deterministic
  * stratified sampling.
  *
  * Shapes are the published pipeline designs re-expressed as Spark plans —
  * repetition filters follow Gopher's repetition heuristics (Rae et al.
  * 2021, §A1.1), span dedup follows C4's repeated-span removal (Raffel et
  * al. 2020, §2.2), contamination is the n-gram-overlap test every eval
  * pipeline runs. All kernels are codegen'd built-ins (split / explode /
  * window / hash aggregates), no UDFs; every operator shuffles on a hash
  * or doc key, never on text, so at 100 TB the exchanges carry fixed-width
  * digests while the wide text column stays map-side.
  */
object Corpus {

  /** Non-empty whitespace-split words of `textCol`. */
  private def words(textCol: Column): Column =
    filter(split(textCol, " "), w => w =!= "")

  /** Gopher-style repetition metrics, one row per doc:
    *  - `top_word_frac`: share of the most frequent word (ties → the
    *    lexicographically smallest word), high = degenerate repetition;
    *  - `dup_2gram_frac`: 1 − distinct/total word-2-grams, high = looping
    *    text;
    *  - `rep_flagged`: either ratio beyond its Gopher-ish threshold.
    * One row per doc, including short ones: a metric whose denominator is
    * empty (no words / no 2-grams) is null and never flags the doc.
    * One kernel pass per document
    * ([[graft.functions.MinHashExpressions.repetitionStats]]) — zero
    * shuffles at any scale. */
  def repetitionMetrics(raw: DataFrame, idCol: String, textCol: String,
                        topWordMax: Double = 0.2,
                        dup2gramMax: Double = 0.2): DataFrame = {
    val df = Dedup.fanOut(raw, idCol)
    val id = col(idCol)
    // one-pass kernel per doc (word counts, top word, distinct 2-grams) —
    // the metrics are purely per-document, so nothing shuffles at any
    // scale; docs with no words keep their row with null metrics (the
    // kernel returns a null struct). n_2grams is n_words − 1 by
    // construction; a doc without 2-grams gets a null fraction.
    val (topFrac, dupFrac) = repetitionFracs(col("__r"))
    df.select(id,
        graft.functions.MinHashExpressions.repetitionStats(col(textCol)).as("__r"))
      .select(id,
        coalesce(col("__r.n_words"), lit(0L)).as("n_words"),
        col("__r.top_word").as("top_word"),
        topFrac.as("top_word_frac"),
        dupFrac.as("dup_2gram_frac"))
      .withColumn("rep_flagged",
        coalesce(col("top_word_frac") > topWordMax, lit(false)) ||
          coalesce(col("dup_2gram_frac") > dup2gramMax, lit(false)))
  }

  /** The Gopher repetition fractions of one `repetitionStats` struct —
    * THE definition, read by both [[repetitionMetrics]] and
    * [[curationDecisions]] so the funnel's repetition stage can never
    * drift from the standalone metric it composes. */
  private def repetitionFracs(r: Column): (Column, Column) = (
    round(r.getField("top_cnt").cast("double") / r.getField("n_words"), 4),
    round(lit(1.0) - r.getField("n_distinct_2grams").cast("double")
      / when(r.getField("n_words") >= 2, r.getField("n_words") - 1), 4))

  /** C4-style corpus-level span dedup: every `n`-word gram instance that
    * also occurs at a lexicographically earlier (doc_id, position) —
    * anywhere in the corpus — counts as a duplicate. Returns per-doc
    * `n_spans` / `n_dup_spans` / `dup_span_frac`.
    *
    * Plan: map-side gram explode → per-gram `min(struct(doc, pos))`
    * aggregate → join back → doc-keyed count. The min-aggregate (not a
    * `row_number` window) is deliberate: it combines MAP-SIDE, so a
    * boilerplate span repeated a billion times across a 100 TB corpus
    * arrives at its reducer as one pre-folded row per map partition,
    * where a per-gram sort window would buffer every instance on a single
    * reducer. The join back is streaming on the instance side (no per-key
    * buffering), and AQE's skew split covers the residue. All exchanges
    * carry the 128-bit digest, never the text. */
  def spanDedup(raw: DataFrame, idCol: String, textCol: String,
                n: Int = 8): DataFrame = {
    val df = Dedup.fanOut(raw, idCol)
    val id = col(idCol)
    // spans feeds the first-instance aggregate AND the join back; pin so
    // the gram explode + hash — the expensive stage — evaluates once.
    // Gram hashes come from the one-pass kernel (md5 of words joined by
    // a space, identical bytes to the array_join formulation).
    val spans = Graphs.pinLocal(df
      .select(id, posexplode(graft.functions.MinHashExpressions
        .wordGramHashes(col(textCol), n)).as(Seq("pos", "h"))))
    val firsts = spans.groupBy(col("h"))
      .agg(min(struct(id, col("pos"))).as("__first"))
    spans.join(firsts, "h")
      .groupBy(id)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(struct(id, col("pos")) =!= col("__first"), 1L).otherwise(0L))
          .as("n_dup_spans"))
      .withColumn("dup_span_frac",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 4))
  }

  /** Benchmark-contamination scan: for each candidate doc, how many of its
    * DISTINCT word `n`-grams appear in the benchmark set's grams. The
    * benchmark side is tiny by definition (eval suites are KBs against a
    * 100 TB corpus), so its distinct-gram digest set is broadcast — the
    * corpus side never shuffles. */
  def contamination(rawCorpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val corpus = Dedup.fanOut(rawCorpus, idCol)
    val id = col(idCol)
    val gramHashes = (c: Column) =>
      graft.functions.MinHashExpressions.wordGramHashes(c, n, dedup = true)
    val benchGrams = benchmark
      .select(explode(gramHashes(col(textCol))).as("h")).distinct()
    // per-doc distinct happens IN the kernel — no corpus-side distinct
    // aggregate, so the doc side is map-side all the way to the
    // broadcast semi-join
    val docGrams = corpus
      .select(id, explode(gramHashes(col(textCol))).as("h"))
    docGrams.join(broadcast(benchGrams), Seq("h"), "left_semi")
      .groupBy(id).agg(count(lit(1)).as("n_overlap"))
      .join(corpus.select(id), Seq(idCol), "right_outer")
      .select(id, coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Contamination at reference-set scales where the exact gram set can no
    * longer broadcast — identical OUTPUT to [[contamination]], different
    * plan. A Bloom filter over the benchmark grams (built distributed by
    * `DataFrameStatFunctions.bloomFilter`, a few bits per gram) stands in
    * for the gram set as the broadcast object, and a map-side
    * might-contain probe (Spark's native `BloomFilterMightContain`
    * expression — codegen'd, the same primitive AQE's runtime row-level
    * filtering injects) prunes corpus grams BEFORE the exchange. Only
    * suspected grams — true overlaps plus the fpp sliver of false
    * positives — shuffle into the exact semi-join that kills the false
    * positives, so the result is exact. At 100 TB: a 100M-gram benchmark
    * is ~115 MB of bloom at 1% fpp (broadcastable) where its exact long
    * set is gigabytes, and the shuffle carries the pruned candidates
    * instead of every corpus gram. */
  def contaminationAtScale(rawCorpus: DataFrame, benchmark: DataFrame,
                           idCol: String, textCol: String, n: Int = 3,
                           fpp: Double = 0.01): DataFrame = {
    val corpus = Dedup.fanOut(rawCorpus, idCol)
    val id = col(idCol)
    val gramHashes = (c: Column) =>
      graft.functions.MinHashExpressions.wordGramHashes(c, n, dedup = true)
    val benchGrams = benchmark
      .select(explode(gramHashes(col(textCol))).as("h")).distinct()
    val pinnedBench = benchGrams.persist()
    try {
      // the gram digests are strings (md5-parity with the oracles);
      // the bloom works on their xxhash64 — same long hashing on the
      // build side (putLong) and the probe side (mightContainLong)
      val bloom = pinnedBench.select(xxhash64(col("h")).as("hl"))
        .stat.bloomFilter("hl", math.max(1L, pinnedBench.count()), fpp)
      val bytes = {
        val out = new java.io.ByteArrayOutputStream()
        bloom.writeTo(out)
        out.toByteArray
      }
      val mightContain = org.apache.spark.sql.graftbridge.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            bytes, org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.graftbridge.GraftBridge.expression(
            xxhash64(col("h")))))
      val suspected = corpus
        .select(id, explode(gramHashes(col(textCol))).as("h"))
        .filter(mightContain)
      // exact confirm WITHOUT broadcast — the at-scale join shape the
      // bloom pre-prune exists for (hash-shuffle both pruned sides)
      suspected.hint("shuffle_hash").join(pinnedBench, Seq("h"), "left_semi")
        .groupBy(id).agg(count(lit(1)).as("n_overlap"))
        .join(corpus.select(id), Seq(idCol), "right_outer")
        .select(id, coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .withColumn("contaminated", col("n_overlap") > 0)
    } finally { pinnedBench.unpersist(); () }
  }

  /** Exact corpus heavy hitters: the tokens whose occurrence count strictly
    * exceeds 1/`k` of all token occurrences. Two physical routes, both
    * exact; `route = "auto"` (default) picks per corpus:
    *
    *  - '''one-pass''' (`"onepass"`): tokenize → `groupBy(token).count` →
    *    threshold. One tokenize pass (the total reuses the grouped
    *    exchange); the right plan when the vocabulary fits a hash
    *    aggregate comfortably — 4-8× faster than the two-phase shape on
    *    closed vocabularies (measured 0.6 s vs 5.3 s at 250k docs).
    *    State is vocabulary-sized (Spark spills past memory, so it stays
    *    correct on any input, just slower when the vocabulary explodes).
    *  - '''Misra-Gries''' (`"mg"`): the guaranteed-bounded shape for open
    *    vocabularies (URLs, hashes, typo-heavy web text) — O(k) state per
    *    partition regardless of vocabulary (Misra & Gries 1982; no
    *    reference analog — corpus operators are parity-plus):
    *
    *    1. every partition streams its documents through a `2k`-counter
    *       batched Misra-Gries summary (O(k) memory however large the
    *       partition). An item with global frequency > n/k must exceed its
    *       local quota n_p/k in at least one partition (else summing the
    *       per-partition bounds caps it at n/k), so the union of partition
    *       survivors is a guaranteed superset of the true heavy hitters.
    *       Text never shuffles; each partition emits ≤ 2k tokens.
    *    2. the candidate set (≤ 2k · partitions rows, broadcast-sized by
    *       construction) semi-joins the re-tokenized corpus map-side and
    *       exact counts apply the threshold freq · k > n. False candidates
    *       die here, so the output is EXACT and independent of
    *       partitioning.
    *
    * Auto routing probes the vocabulary's GROWTH, not just its size: two
    * nested document samples (1% and 2%, same seed) each get an HLL NDV,
    * and the Heaps-law slope between them is linearly extrapolated to
    * the full corpus ([[chooseHeavyHitterRoute]]); a projected
    * vocabulary at or past `onePassMaxVocab` routes to MG, anything else
    * to one-pass (a misestimate costs spill time, never correctness).
    * Corpora under [[HeavyHitterProbeMinDocs]] documents skip the probe
    * entirely — at that size even a fully open vocabulary fits the
    * one-pass hash aggregate, and the two probe jobs would cost more
    * than the query. */
  def heavyHitters(raw: DataFrame, idCol: String, textCol: String,
                   k: Int = 64, route: String = "auto",
                   onePassMaxVocab: Long = 2000000L): DataFrame = {
    require(k >= 2, s"heavyHitters needs k >= 2, got $k")
    require(Set("auto", "mg", "onepass")(route), s"unknown route '$route'")
    val spark = raw.sparkSession
    import spark.implicits._
    val df = Dedup.fanOut(raw, idCol)
    val chosen =
      if (route != "auto") route
      else chooseHeavyHitterRoute(df, textCol, onePassMaxVocab)
    if (chosen == "onepass") return heavyHittersOnePass(df, textCol, k)
    // pass 1: per-partition summaries, plus each partition's token total
    // (tagged row) so the threshold needs no third scan
    val summaries = df.select(col(textCol).cast("string")).as[String]
      .mapPartitions { texts =>
        // Batched Misra-Gries (the mergeable-summaries purge, Agarwal et
        // al. 2013; same scheme as DataSketches' frequent-items): hold up
        // to 2k counters, insert misses at count 1, and when the table
        // fills subtract the upper-median value m from every counter,
        // evicting the non-positive half. Soundness: ≥ k counters sit at
        // or above the median, so each purge destroys ≥ k·m units of
        // inserted mass; with n_p total insertions, Σ m_i ≤ n_p/k, and a
        // token's stored count undercounts its true partition frequency
        // by at most Σ m_i — so freq_p > n_p/k stays positive and
        // survives to the candidate set. (A prior "deferred decrement"
        // variant charged misses that classic MG would have turned into
        // insertions as debt against live counters, which could evict
        // true heavy hitters; this purge has the textbook bound.) Each
        // purge frees ≥ half the slots → amortized O(log k) per miss.
        val cap = 2 * k
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        var total = 0L
        def purge(): Unit = {
          val vals = counters.values.toArray
          java.util.Arrays.sort(vals)
          val m = vals(vals.length / 2)
          counters.keys.toArray.foreach { kk =>
            val c = counters(kk) - m
            if (c <= 0L) counters.remove(kk)
            else counters.update(kk, c)
          }
        }
        texts.foreach { t =>
          if (t != null) t.split(' ').foreach { w =>
            if (w.nonEmpty) {
              total += 1
              counters.get(w) match {
                case Some(c) => counters.update(w, c + 1L)
                case None =>
                  if (counters.size >= cap) purge()
                  counters.update(w, 1L)
              }
            }
          }
        }
        counters.keysIterator.map(w => (w, false, 0L)) ++
          Iterator(("", true, total))
      }.toDF("token", "is_total", "n")
    val pinned = summaries.persist()
    try {
      val total = pinned.filter(col("is_total"))
        .agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
      val candidates = pinned.filter(!col("is_total")).select("token").distinct()
      df.select(explode(words(col(textCol))).as("token"))
        .join(broadcast(candidates), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .filter(col("freq") * k > total)
        .orderBy(desc("freq"), col("token"))
    } finally { pinned.unpersist(); () }
  }

  /** The closed-vocabulary fast path: one tokenize pass, the grouped
    * exchange reused for the total (ReuseExchange dedupes the two
    * aggregate branches), threshold applied via a broadcast scalar. */
  private def heavyHittersOnePass(df: DataFrame, textCol: String,
                                  k: Int): DataFrame = {
    val counts = df.select(explode(words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum("freq").as("__total"))
    counts.crossJoin(broadcast(total))
      .filter(col("freq") * k > col("__total"))
      .select(col("token"), col("freq"))
      .orderBy(desc("freq"), col("token"))
  }

  /** Below this many documents the auto route skips the growth probe and
    * takes one-pass directly (probe cost would exceed the query's). */
  private[graft] val HeavyHitterProbeMinDocs = 20000

  /** Auto-route probe: two nested document samples (1% and 2%, same
    * seed → the smaller is a subset) give the vocabulary's GROWTH under
    * doubling, the Heaps-law signal a single sample's NDV cannot: a
    * closed vocabulary has ndv(2%) ≈ ndv(1%) (slope ~0), an open one
    * keeps minting tokens (slope ~ndv(1%)). The corpus vocabulary is
    * projected by linear extrapolation of that slope — exact for
    * open/linear growth, a safe overestimate for anything sublinear —
    * and compared to the one-pass budget. A sub-5% slope is HLL noise,
    * treated as zero. Two HLL sketches over ~3% of the corpus; map-side
    * partials, bytes on the wire. Spec-pinned in CorpusSpec; measured in
    * ProfileTextScale (250k-doc closed corpus → onepass, 4M-token open
    * fixture → mg). */
  private[graft] def chooseHeavyHitterRoute(df: DataFrame, textCol: String,
                                            onePassMaxVocab: Long): String = {
    // tiny corpus → skip the probe: even one unique token per word keeps
    // the one-pass hash aggregate comfortable below this many documents,
    // and the two tokenize+HLL probe jobs would dominate the query cost.
    // limit().count() short-circuits the scan, so the check is ~free.
    if (df.limit(HeavyHitterProbeMinDocs).count() < HeavyHitterProbeMinDocs)
      return "onepass"
    def ndvAt(frac: Double): Long =
      df.sample(withReplacement = false, frac, seed = 42)
        .select(explode(words(col(textCol))).as("w"))
        .agg(approx_count_distinct("w")).head().getLong(0)
    val s1 = ndvAt(0.01)
    val s2 = ndvAt(0.02)
    val slope = if (s2 - s1 < 0.05 * math.max(1L, s1)) 0L else s2 - s1
    val projected = s2 + slope * 98
    if (projected >= onePassMaxVocab) "mg" else "onepass"
  }

  /** Sliding-window document chunking — the standard pretraining/RAG prep
    * step: split each doc into `chunkWords`-word windows advancing by
    * `chunkWords - overlap`, the tail chunk keeping whatever remains.
    * Pure map-side (sequence + slice + posexplode, all codegen'd): no
    * shuffle at any scale, output rows carry (doc, chunk ordinal, text,
    * word count). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkWords: Int, overlap: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < chunkWords,
      s"overlap ($overlap) must be in [0, chunkWords=$chunkWords)")
    val stride = chunkWords - overlap
    val id = col(idCol)
    val w = words(col(textCol))
    df.select(id, w.as("__w"))
      .filter(size(col("__w")) > 0)
      // start bound n − overlap − 1, not n − 1: a start inside the final
      // overlap window would emit a tail chunk whose every word is
      // already in the previous chunk — pure duplicate content injected
      // into a pipeline whose other half exists to remove duplicates.
      // Coverage still holds: the last admitted start + chunkWords ≥ n.
      .select(id, posexplode(
        transform(sequence(lit(0),
            greatest(lit(0), size(col("__w")) - overlap - 1), lit(stride)),
          start => slice(col("__w"), start + 1, lit(chunkWords))))
        .as(Seq("chunk_id", "__c")))
      .select(id, col("chunk_id"),
        array_join(col("__c"), " ").as("chunk_text"),
        size(col("__c")).cast("long").as("n_chunk_words"))
  }

  /** Corpus TF-IDF: the `k` most characteristic words per document.
    * tf = in-doc occurrences; idf = ln(N / df) with df = number of docs
    * containing the word; ranking is (rounded score desc, term asc) so it
    * is deterministic and differential-testable. Plan: two hash aggregates
    * — (doc, word) term frequencies, then word-keyed document frequencies
    * folded FROM the tf table (no second text scan) — joined back on the
    * word, then a doc-keyed top-k window. Every exchange is keyed by word
    * or doc id; the corpus-size N is a 1-row aggregate. At 100 TB the
    * df table is vocabulary-sized (Heaps' law, ≪ corpus) and the join back
    * to tf shuffles on the word — the natural key, with AQE covering
    * stopword skew.
    *
    * Ids must be UNIQUE (one row per document) — duplicate ids would
    * double-count document frequencies (same contract as
    * [[graft.operators.Dedup]]'s id-keyed operators). */
  def tfidfTopTerms(raw: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    // corpus size as a lazy 1-row aggregate broadcast into the plan (no
    // eager driver-side count job at operator-construction time)
    val nDf = raw.agg(count(lit(1)).cast("double").as("__n"))
    val df0 = Dedup.fanOut(raw, idCol)
    val id = col(idCol)
    // tf feeds two consumers (document frequencies + the score join); pin
    // it so the text scan runs once, not once per consumer. The per-doc
    // term histogram comes from the one-pass kernel — (doc, term) pairs
    // are unique per doc by construction, so there is NO tf aggregate:
    // the table is map-side explode output.
    val tf = Graphs.pinLocal(df0
      .select(id, explode(graft.functions.MinHashExpressions
        .wordCounts(col(textCol))).as("tc"))
      .select(id, col("tc.w").as("term"), col("tc.cnt").as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDf))
      .select(id, col("term"),
        round(col("tf").cast("double") *
          log(col("__n") / col("df").cast("double")), 4).as("tfidf"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(id).orderBy(desc("tfidf"), col("term"))))
      .filter(col("rank") <= k)
      .select(id, col("term"), col("tfidf"), col("rank"))
  }

  /** Linear bag-of-words classifier scoring — the fastText-style quality
    * classifier application step (score a corpus against a TRAINED weight
    * table; training itself is offline). For each doc: `margin` = bias +
    * Σ(cnt·weight)/Σcnt over its term histogram (mean token weight, the
    * fastText reduction; unseen terms weigh 0). Returns (id, `n_terms`,
    * `margin`) — apply a sigmoid/threshold downstream; the margin keeps
    * the arithmetic engine-exact (no transcendentals). Docs with no words
    * drop. The doc side is one kernel pass + explode; the weight table
    * joins broadcast when it fits (vocabularies are ≤ millions of rows
    * against a 100 TB corpus), falling back to a term-keyed shuffle join
    * otherwise; the only doc-keyed exchange carries (id, partial sums).
    * Ids must be unique (one row per document). */
  def classifierScore(raw: DataFrame, idCol: String, textCol: String,
                      weights: DataFrame, termCol: String = "term",
                      weightCol: String = "weight",
                      bias: Double = 0.0): DataFrame = {
    val df0 = Dedup.fanOut(raw, idCol)
    val id = col(idCol)
    val tc = df0.select(id, explode(graft.functions.MinHashExpressions
        .wordCounts(col(textCol))).as("tc"))
      .select(id, col("tc.w").as("__term"), col("tc.cnt").as("__cnt"))
    val w = weights.select(col(termCol).as("__term"),
      col(weightCol).cast("double").as("__w"))
    // per-term contributions fold as exact decimals so the mean is
    // accumulation-order-free (hash-compare safe across engines) — the
    // same convention as charBigramLmScore
    tc.join(w, Seq("__term"), "left")
      .groupBy(id)
      .agg(sum(col("__cnt")).as("n_terms"),
        sum((col("__cnt").cast("double") * coalesce(col("__w"), lit(0.0)))
          .cast("decimal(28,10)")).as("__dot"))
      .select(id, col("n_terms"),
        round(lit(bias) + col("__dot").cast("double") / col("n_terms"), 4)
          .as("margin"))
  }

  /** Language-model quality proxy (the CCNet/Wikipedia-LM filtering idea,
    * self-trained): fit a character-bigram model ON the corpus itself and
    * score every document by its mean log-probability under that model —
    * degenerate text (keyboard mash, encoding garbage, repeated glyphs)
    * scores far below natural prose. Returns (id, `lm_score`, `n_bigrams`);
    * docs shorter than 2 chars drop out (no bigram).
    *
    * Plan: one map-side bigram explode feeds (a) the model — two
    * aggregates bounded by the DISTINCT OBSERVED bigrams (alphabet² worst
    * case: a few KB for alphabetic corpora, but millions of rows on CJK /
    * multilingual text, so the join is left unhinted — the planner
    * broadcasts when the model fits and falls back to a gram-keyed shuffle
    * join when it doesn't) — and (b) the scoring join; the other data-sized
    * exchange is the final doc-keyed average. Per-bigram log-probs are
    * rounded to 6dp and summed as exact
    * decimals so the mean is accumulation-order-free (hash-compare safe
    * across engines). */
  def charBigramLmScore(raw: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df0 = Dedup.fanOut(raw, idCol)
    val id = col(idCol)
    // per-doc bigram HISTOGRAMS from the one-pass kernel feed three
    // consumers (bigram counts, start-char counts, the scoring join); pin
    // so the text scan evaluates once. Every downstream exchange carries
    // per-doc DISTINCT grams with multiplicities, never the instance
    // stream.
    val grams = Graphs.pinLocal(df0
      .select(id, explode(graft.functions.MinHashExpressions
        .charBigramCounts(col(textCol))).as("gc"))
      .select(id, col("gc.g").as("g"), col("gc.cnt").as("cnt")))
    val bi = grams.groupBy("g").agg(sum("cnt").as("cnt2"))
    // P(c2|c1): denominator = occurrences of c1 as a bigram START, derived
    // from the same gram stream (no second text scan)
    val uni = grams.groupBy(substring(col("g"), 1, 1).as("c1"))
      .agg(sum("cnt").as("cnt1"))
    val probs = bi.withColumn("c1", substring(col("g"), 1, 1))
      .join(uni, "c1")
      .select(col("g"),
        round(log(col("cnt2").cast("double") / col("cnt1").cast("double")), 6).as("lp"))
    // sum(lp · cnt) in exact decimal == the per-instance decimal fold
    grams.join(probs, "g")
      .groupBy(id)
      .agg(
        round(sum(col("lp").cast("decimal(18,6)") * col("cnt")).cast("double")
          / sum(col("cnt")), 4).as("lm_score"),
        sum(col("cnt")).as("n_bigrams"))
  }

  /** CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * arXiv:1911.00359 §4.4 — corpora are split into head/middle/tail by
    * LM perplexity and consumed selectively). Threshold-based, not
    * `ntile`: a global ntile window funnels the corpus through ONE
    * partition; here the `nBuckets−1` quantile boundaries come from the
    * distributed [[Stats.quantiles]] job and land as literals in a
    * comparison chain, so assignment is pure map-side at any scale.
    * Adds `bucket` (1 = lowest `scoreCol`, `nBuckets` = highest — with a
    * mean-log-prob score like [[charBigramLmScore]]'s, the top bucket is
    * CCNet's "head"; a null score yields a null bucket). Boundary ties go
    * to the lower bucket in both engines (strict `>` chain). Boundaries
    * are DELIBERATELY the 4dp-rounded [[Stats.quantiles]] — bucket edges
    * must be cross-engine-stable for the oracle twin, and scores
    * themselves are published at the same display precision (the
    * [[charBigramLmScore]] trade); equi-depth HISTOGRAMS, whose counts
    * must tie out exactly, keep using the unrounded boundaries per
    * [[Stats]]' contract. */
  def perplexityBuckets(scored: DataFrame, scoreCol: String,
                        nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, "perplexityBuckets: need at least 2 buckets")
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val rows = Stats.quantiles(scored, scoreCol, qs).orderBy("q").collect()
    require(rows.forall(!_.isNullAt(1)),
      s"perplexityBuckets: `$scoreCol` has no non-null values to bucket")
    val bounds = rows.map(_.getDouble(1))
    val bucket = bounds.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col(scoreCol) > lit(b), 1).otherwise(0)
    }
    scored.withColumn("bucket",
      when(col(scoreCol).isNotNull, bucket))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169):
    * score every corpus document by the mean log-likelihood ratio of its
    * words under a TARGET-domain unigram distribution vs the corpus
    * distribution — the standard "make the pretraining mix look like the
    * target domain" selection signal; resample downstream with
    * [[stratifiedSample]]/[[applyMixRates]] on the weight.
    *
    * `lr(w) = round(ln(((t_w+1)·(C+1)) / ((c_w+1)·(T+1))), 6)` with
    * add-one smoothing over the corpus vocabulary; per-doc weight is the
    * exact-decimal mean of `lr` over word instances (rounded 4dp,
    * accumulation-order-free — the [[charBigramLmScore]] convention).
    * Docs with no words drop. Returns (id, `n_words`, `dsir_weight`).
    *
    * Plan shape: one kernel histogram pass per side; every exchange is
    * vocabulary-keyed (distinct words, never the instance stream), the
    * totals are 1-row broadcasts, and the final aggregate is doc-keyed.
    * The paper's hashed-feature variant is [[importanceWeightsHashed]] —
    * same plan, fixed-width key space. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    importanceWeightsOn(raw, target, idCol, textCol, identity)

  /** [[importanceWeights]] over the paper's actual feature space: words
    * bucketed through `pmod(xxhash64(w), nBuckets)` (DSIR §3 hashes
    * n-grams into 10k buckets). The distribution is fixed-width no matter
    * the vocabulary — at 100 TB the ratio table is exactly `nBuckets`
    * rows, always broadcastable, immune to typo/CJK vocabulary explosion.
    * With a collision-free bucket count the weights equal
    * [[importanceWeights]]' exactly (spec-pinned); at the paper's 10k,
    * collisions coarsen the distribution the same way they do in DSIR. */
  def importanceWeightsHashed(raw: DataFrame, target: DataFrame,
                              idCol: String, textCol: String,
                              nBuckets: Int = 10000): DataFrame =
    importanceWeightsOn(raw, target, idCol, textCol,
      w => pmod(xxhash64(w), lit(nBuckets.toLong)))

  private def importanceWeightsOn(raw: DataFrame, target: DataFrame,
                                  idCol: String, textCol: String,
                                  feature: Column => Column): DataFrame = {
    val df0 = Dedup.fanOut(raw, idCol)
    val id = col(idCol)
    val grams = Graphs.pinLocal(df0
      .select(id, explode(graft.functions.MinHashExpressions
        .wordCounts(col(textCol))).as("tc"))
      // two words sharing a bucket may yield duplicate (id, w) rows —
      // harmless: every consumer SUMs over them, and Σcnt_i·lr ≡ (Σcnt_i)·lr
      .select(id, feature(col("tc.w")).as("w"), col("tc.cnt").as("cnt")))
    val corpus = grams.groupBy("w").agg(sum("cnt").as("ccnt"))
    val tgt = target
      .select(explode(graft.functions.MinHashExpressions
        .wordCounts(col(textCol))).as("tc"))
      .select(feature(col("tc.w")).as("w"), col("tc.cnt").as("cnt"))
      .groupBy("w").agg(sum("cnt").as("tcnt"))
    val cTot = corpus.agg(sum("ccnt").as("c"))
    val tTot = tgt.agg(coalesce(sum("tcnt"), lit(0L)).as("t"))
    val lr = corpus.join(tgt, Seq("w"), "left")
      .crossJoin(broadcast(cTot)).crossJoin(broadcast(tTot))
      .select(col("w"), round(log(
        ((coalesce(col("tcnt"), lit(0L)) + 1).cast("double") * (col("c") + 1)) /
          ((col("ccnt") + 1).cast("double") * (col("t") + 1))), 6).as("lr"))
    grams.join(lr, "w")
      .groupBy(id)
      .agg(sum("cnt").as("n_words"),
        round(sum(col("lr").cast("decimal(18,6)") * col("cnt")).cast("double")
          / sum(col("cnt")), 4).as("dsir_weight"))
  }

  /** Corpus composition report: document/token/char volume and corpus share
    * per stratum (e.g. source × lang) — the first dashboard every curation
    * pipeline builds. One doc-keyed scan folds per-doc word counts
    * map-side; the stratum rollup is a tiny second aggregate, and the
    * share is a window over the handful of stratum rows (post-aggregate
    * cardinality, not data-sized). */
  def sourceMix(df: DataFrame, textCol: String, dims: Seq[String]): DataFrame = {
    val d = dims.map(col)
    val perDoc = df.select(d :+ size(words(col(textCol))).cast("long").as("__nw")
      :+ length(col(textCol)).cast("long").as("__nc"): _*)
    perDoc.groupBy(d: _*)
      .agg(count(lit(1)).as("n_docs"), sum("__nw").as("n_words"),
        round(avg("__nc"), 4).as("avg_chars"))
      .withColumn("doc_share",
        round(col("n_docs") / sum("n_docs").over(Window.partitionBy()), 4))
  }

  /** Deterministic stratified sampling: keep a row iff the first three hex
    * nibbles of `md5(key)` — a uniform 0..4095 bucket — fall under the
    * stratum's rate. Pure map-side (no shuffle, no RNG state), so the
    * sample is reproducible across runs, executors, and engines; the same
    * arithmetic re-derives in SQL for the oracle. */
  def hashBucket(keyCol: Column): Column =
    // null keys land deterministically in bucket 0 — kept whenever the
    // stratum's rate is positive. The raw md5(null) is null, and a null
    // comparison silently DROPPED null-key rows even at rate 1.0
    // (while applyMixRates kept them — the paired samplers disagreed).
    // A keyless row has no uniform-sampling story; assign real keys for
    // proportional cuts.
    coalesce(
      conv(substring(md5(keyCol.cast("string")), 1, 3), 16, 10).cast("long"),
      lit(0L))

  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val thresholds = rates.foldLeft(lit(math.round(defaultRate * 4096).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, math.round(rate * 4096).toLong).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < thresholds)
  }

  /** Domain-rebalancing sampling rates: given a TARGET corpus mix per
    * stratum, compute the per-stratum downsampling rate that realizes the
    * closest achievable mix WITHOUT upsampling — rate ∝ target share /
    * current share, normalized so the scarcest-relative stratum is kept
    * whole (rate 1.0) and every other stratum is cut proportionally.
    * Output one row per observed stratum: (stratum, `n_docs`,
    * `current_share`, `target_share`, `sample_rate`); strata absent from
    * `target` get rate 0. Feed the rates into [[stratifiedSample]] for the
    * deterministic cut. One scan + a stratum-cardinality aggregate; the
    * share windows run over the handful of stratum rows, never the data. */
  def mixWeights(df: DataFrame, stratumCol: String,
                 target: Map[String, Double]): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("__cur",
        col("n_docs") / sum("n_docs").over(Window.partitionBy()))
    val t = target.foldLeft(lit(0.0)) { case (acc, (s, v)) =>
      when(col(stratumCol) === s, v).otherwise(acc)
    }
    counts.withColumn("target_share", t)
      .withColumn("__w", col("target_share") / col("__cur"))
      .select(col(stratumCol), col("n_docs"),
        round(col("__cur"), 4).as("current_share"), col("target_share"),
        // guard the no-overlap degenerate case (every __w = 0): the
        // documented contract is rate 0 — and 0/0 throws under ANSI mode
        round(when(max("__w").over(Window.partitionBy()) > 0,
            col("__w") / max("__w").over(Window.partitionBy()))
          .otherwise(lit(0.0)), 4).as("sample_rate"))
  }

  /** Materialize a domain-rebalanced corpus from per-stratum sampling
    * RATES ([[mixWeights]] output, or hand-chosen): rate < 1 downsamples
    * through the same deterministic md5 bucket as [[stratifiedSample]];
    * rate > 1 upsamples by emitting `floor(rate)` copies plus one more
    * when the doc's bucket falls under the fractional remainder — so the
    * expected multiplicity of every stratum is exactly its rate. Each
    * copy carries an `epoch` column (0-based) so downstream packing /
    * shuffling can interleave repeats instead of training on back-to-back
    * duplicates. Strata absent from `rates` get `defaultRate` (1.0 =
    * pass through). Fully map-side — no shuffle, no RNG state — and the
    * identical arithmetic re-derives in SQL, so the materialized mix is
    * reproducible across runs, executors, and engines. */
  def applyMixRates(df: DataFrame, keyCol: String, stratumCol: String,
                    rates: Map[String, Double],
                    defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(_ >= 0.0) && defaultRate >= 0.0,
      "sampling rates must be non-negative")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, r).otherwise(acc)
    }
    val base = floor(rate)
    val fracThreshold = round((rate - base) * 4096, 0).cast("long")
    val copies = base +
      when(hashBucket(col(keyCol)) < fracThreshold, 1L).otherwise(0L)
    df.withColumn("__n_copies", copies)
      .filter(col("__n_copies") > 0)
      .withColumn("epoch",
        explode(expr("sequence(0, CAST(__n_copies AS INT) - 1)")))
      .drop("__n_copies")
  }

  /** Deterministic training-order shuffle: address every row with a
    * pseudorandom (`shard`, `pos`) — `md5(seed:key)` orders the corpus,
    * the digest's top 24 bits pick the output shard (bucket space 2^24;
    * mod over it gives a non-divisor `nShards` a shard-size bias of
    * ≈ nShards/2^24 relative — still negligible for any practical writer
    * parallelism), and
    * `pos` is the row's rank within its shard. The plan is one exchange
    * keyed by shard plus per-shard window ranks: no global sort ever
    * lands on one reducer, and at 100 TB `nShards` is simply the writer
    * parallelism. Same seed → bit-identical order on any cluster; a new
    * seed is a fresh epoch permutation.
    *
    * The rows must be UNIQUE under `keyCol` ++ `extraKeyCols` — pass the
    * disambiguating columns (e.g. [[applyMixRates]]'s `epoch`) in
    * `extraKeyCols` so repeated documents hash to DIFFERENT addresses and
    * epoch copies interleave instead of landing back-to-back. */
  def trainingOrder(df: DataFrame, keyCol: String, seed: Long = 0,
                    nShards: Int = 32,
                    extraKeyCols: Seq[String] = Nil): DataFrame = {
    require(nShards > 0 && nShards <= (1 << 24),
      s"nShards must be in 1..${1 << 24}: $nShards")
    val keyParts = (keyCol +: extraKeyCols)
      .flatMap(c => Seq(lit(":"), col(c).cast("string")))
    val sortKey = md5(concat(lit(seed.toString) +: keyParts: _*))
    val tieBreak = (keyCol +: extraKeyCols).map(col)
    df.withColumn("__sort_key", sortKey)
      // 6-nibble (24-bit) bucket — same arithmetic family as
      // [[hashBucket]], over the already-computed digest so md5 runs once
      .withColumn("shard",
        (conv(substring(col("__sort_key"), 1, 6), 16, 10).cast("long")
          % nShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__sort_key") +: tieBreak: _*)).cast("long"))
      .drop("__sort_key")
  }

  /** Sequence packing — the pretraining prep step that concatenates
    * documents into fixed `budget`-token training sequences: within a
    * shard, documents are streamed in id order and the token stream is cut
    * every `budget` tokens; each document is assigned the pack where its
    * first token lands (`pack_id`) at `pack_offset`. Ids must be
    * non-negative (the deterministic shard is `id % nShards`).
    *
    * Sharding is the scale story: a single global running sum would be one
    * sort on one reducer, so the cumulative sum is PARTITIONED by the
    * deterministic shard — at 100 TB set `nShards` to a multiple of the
    * cluster's core count and packing runs as independent per-shard window
    * sums behind one shard-keyed exchange of (id, count) pairs; the text
    * column itself never shuffles. Packs never span shards, so parallelism
    * costs at most one underfull tail pack per shard. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Int, nShards: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nShards > 0, s"nShards must be positive: $nShards")
    val id = col(idCol)
    val perDoc = df.select(id, (id % nShards).cast("int").as("shard"),
      size(words(col(textCol))).cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("__cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(id, col("shard"),
        expr(s"__cum div ${budget}L").as("pack_id"),
        col("n_tokens"),
        (col("__cum") % budget).as("pack_offset"))
  }

  /** Per-document curation decision: (id, `stage`) where `stage` is the
    * FIRST rejecting stage (names sort in pipeline order) or `0_kept`.
    * This is the per-doc surface behind [[curationFunnel]]; filter on
    * `stage = '0_kept'` to materialize the curated corpus.
    *
    * Stages compose the library kernels: length band and word-length band
    * ([[graft.functions.TextFunctions.qualityMetrics]]), language ID
    * (`und` = no marker fired), and Gopher repetition flags (the
    * [[graft.functions.MinHashExpressions.repetitionStats]] kernel,
    * evaluated INLINE and lazily — a doc rejected by an earlier stage
    * never runs the repetition pass, and the whole decision is one
    * map-side pass with no join, so it composes with Structured
    * Streaming). A metric whose denominator is empty is null and does not
    * reject (same convention as the kernels themselves). */
  def curationDecisions(raw: DataFrame, idCol: String, textCol: String,
                        minChars: Long = 100, maxChars: Long = 10000,
                        minWordLen: Double = 3.0, maxWordLen: Double = 12.0,
                        topWordMax: Double = 0.2,
                        dup2gramMax: Double = 0.2): DataFrame = {
    val id = col(idCol)
    val t = col(textCol)
    val m = graft.functions.TextFunctions.qualityMetrics(t).toMap
    // cheap map-side stages first (null = survived them all); the word-len
    // band is guarded on n_words > 0 — an all-whitespace doc inside the
    // char band must fall through to the language stage, not divide by
    // zero under ANSI mode (CASE conditions evaluate lazily in order, and
    // the final branch's repetition kernel runs only for docs that
    // survived every earlier stage)
    val awl = when(m("n_words") > 0, m("avg_word_len"))
    // the repetition struct is PROJECTED once (guarded on early-stage
    // survival, so rejected docs never run the kernel) and both fractions
    // read fields of that single column — CollapseProject does not inline
    // a non-cheap alias referenced more than once, so the kernel runs at
    // most once per row
    val (topWordFrac, dup2gramFrac) = repetitionFracs(col("__r"))
    val repFlagged = coalesce(topWordFrac > topWordMax, lit(false)) ||
      coalesce(dup2gramFrac > dup2gramMax, lit(false))
    raw.select(id,
        when(!m("n_chars").between(minChars, maxChars), "1_length")
          .when(!awl.between(minWordLen, maxWordLen), "2_word_len")
          .when(graft.functions.TextFunctions.langId(t) === "und", "3_lang")
          .as("__early"),
        t)
      .select(id, col("__early"),
        when(col("__early").isNull,
          graft.functions.MinHashExpressions.repetitionStats(t)).as("__r"))
      .select(id, coalesce(col("__early"),
        when(repFlagged, "4_repetition").otherwise("0_kept")).as("stage"))
  }

  /** Multi-stage curation funnel: [[curationDecisions]] rolled up to one
    * row per stage with doc counts and corpus share — the attrition
    * dashboard a curation pipeline publishes before committing a training
    * mix. The rollup is a stage-cardinality aggregate; nothing data-sized
    * reaches the driver. */
  def curationFunnel(raw: DataFrame, idCol: String, textCol: String,
                     minChars: Long = 100, maxChars: Long = 10000,
                     minWordLen: Double = 3.0, maxWordLen: Double = 12.0,
                     topWordMax: Double = 0.2,
                     dup2gramMax: Double = 0.2): DataFrame =
    curationDecisions(raw, idCol, textCol, minChars, maxChars,
        minWordLen, maxWordLen, topWordMax, dup2gramMax)
      .groupBy("stage").agg(count(lit(1)).as("n_docs"))
      .withColumn("doc_share",
        round(col("n_docs") / sum("n_docs").over(Window.partitionBy()), 4))
}
