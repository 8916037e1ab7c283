package graft.operators

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionMetrics flags degenerate repetition, passes varied text") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam ham"),     // top word 90%
      (2L, "go stop go stop go stop go stop go stop"),              // looping 2-grams
      (3L, "one two three four five six seven eight nine ten")      // clean
    ).toDF("doc_id", "text")
    val m = Corpus.repetitionMetrics(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "top_word", "top_word_frac", "dup_2gram_frac", "rep_flagged")
      .as[(Long, String, Double, Double, Boolean)].collect()
    assert(m(0) == ((1L, "spam", 0.9, 0.7778, true))) // 1 - 2/9, 4 dp
    // doc 2: words alternate → every 2-gram repeats ("go stop"×5, "stop go"×4)
    assert(m(1)._2 == "go" && m(1)._5, s"looping doc not flagged: ${m(1)}")
    assert(m(2) == ((3L, "eight", 0.1, 0.0, false))) // ties → lexicographic min
  }

  test("repetitionMetrics keeps short docs: one row per doc, null metrics, unflagged") {
    val df = Seq((1L, ""), (2L, "solo"), (3L, "two words")).toDF("doc_id", "text")
    val m = Corpus.repetitionMetrics(df, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "n_words", "top_word", "top_word_frac", "dup_2gram_frac", "rep_flagged")
      .collect()
    assert(m.length == 3, "short docs must not be dropped")
    assert(m(0).getLong(1) == 0L && m(0).isNullAt(2) && m(0).isNullAt(3) &&
      m(0).isNullAt(4) && !m(0).getBoolean(5))
    // a 1-word doc has a top word (frac 1.0 → flagged) but no 2-grams
    assert(m(1).getLong(1) == 1L && m(1).getString(2) == "solo" &&
      m(1).getDouble(3) == 1.0 && m(1).isNullAt(4) && m(1).getBoolean(5))
    // 2 words, 1 distinct 2-gram: dup frac 0.0; still flagged via top-word
    // share (1/2 > 0.2), as the formula says it should be
    assert(m(2).getLong(1) == 2L && m(2).getDouble(4) == 0.0 && m(2).getBoolean(5))
  }

  test("spanDedup marks every later instance of a span, corpus-wide") {
    val span = "a b c d e f g h" // exactly 8 words
    val df = Seq(
      (1L, s"$span tail one two three four five six seven"),
      (2L, s"lead $span"),          // same span, later doc → dup
      (3L, s"$span $span")          // twice in one doc: 9 grams, several dup
    ).toDF("doc_id", "text")
    val r = Corpus.spanDedup(df, "doc_id", "text", 8)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)].collect()
    assert(r(0) == ((1L, 9L, 0L)), s"first doc owns its spans: ${r(0)}")
    // doc 2 has 2 grams; the one equal to `span` is a dup of doc 1's pos 0
    assert(r(1)._2 == 2L && r(1)._3 >= 1L, s"cross-doc dup missed: ${r(1)}")
    // doc 3: gram 0 duplicates doc 1's span, gram 8 duplicates gram 0; the
    // 7 interior rotations are novel (each occurs once corpus-wide)
    assert(r(2) == ((3L, 9L, 2L)), s"in-doc repeat miscounted: ${r(2)}")
  }

  test("contamination counts distinct-gram overlap; clean docs report zero") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma nine ten"),   // contains bench 3-gram "alpha beta gamma"
      (2L, "one two three four five")      // clean
    ).toDF("doc_id", "text")
    val r = Corpus.contamination(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_overlap", "contaminated")
      .as[(Long, Long, Boolean)].collect()
    assert(r(0) == ((1L, 1L, true)))
    assert(r(1) == ((2L, 0L, false)))
  }

  test("chunk slides a word window with overlap; tail keeps the remainder") {
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "solo"))
      .toDF("doc_id", "text")
    val r = Corpus.chunk(df, "doc_id", "text", chunkWords = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_words")
      .as[(Long, Int, String, Long)].collect()
    // stride 3 over 10 words: starts 0,3,6 — start 9 is NOT emitted
    // (its chunk would be the pure-overlap tail "w10", entirely
    // contained in the previous chunk); coverage still reaches w10
    assert(r.toSeq == Seq(
      (1L, 0, "w1 w2 w3 w4", 4L),
      (1L, 1, "w4 w5 w6 w7", 4L),
      (1L, 2, "w7 w8 w9 w10", 4L),
      (2L, 0, "solo", 1L)))
    intercept[IllegalArgumentException] {
      Corpus.chunk(df, "doc_id", "text", chunkWords = 4, overlap = 4)
    }
  }

  test("charBigramLmScore ranks degenerate text below natural prose") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and then the dog sleeps near the door"),
      (1L, "the rain in spain stays mainly on the plain and the plain is green in the spring"),
      (2L, "zq xj qz jx zzq qqx jjz xqz zjq qxz zzj xxq"), // keyboard mash
      (3L, "a") // too short for a bigram: drops out
    ).toDF("doc_id", "text")
    val s = Corpus.charBigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s.keySet == Set(0L, 1L, 2L))
    assert(s(2L) < s(0L) && s(2L) < s(1L), s.toString)
  }

  test("stratifiedSample is deterministic and tracks the stratum rates") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5)
    val s1 = Corpus.stratifiedSample(df, "doc_id", "lang", rates, defaultRate = 0.0625)
    val s2 = Corpus.stratifiedSample(df, "doc_id", "lang", rates, defaultRate = 0.0625)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    // md5 buckets are uniform: 2000 en rows at rate 0.5 → ~1000; zh at 1/16 → ~125
    assert(math.abs(byLang("en") - 1000L) < 150, s"en kept ${byLang("en")}")
    assert(math.abs(byLang.getOrElse("zh", 0L) - 125L) < 60, s"zh kept ${byLang.get("zh")}")
    // a rate of zero keeps nothing
    assert(Corpus.stratifiedSample(df, "doc_id", "lang", Map.empty, 0.0).count() == 0)
  }

  test("mixWeights computes downsampling rates that realize the target mix") {
    val df = (Seq.fill(600)("en") ++ Seq.fill(300)("es") ++ Seq.fill(100)("de"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    val r = Corpus.mixWeights(df, "lang",
        Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.25))
      .orderBy("lang")
      .select("lang", "n_docs", "current_share", "target_share", "sample_rate")
      .as[(String, Long, Double, Double, Double)].collect()
    // weights target/current: en .833, es .833, de 2.5 → de kept whole;
    // applying the rates yields 200/100/100 docs = exactly the 0.5/.25/.25 mix
    assert(r.toSeq == Seq(
      ("de", 100L, 0.1, 0.25, 1.0),
      ("en", 600L, 0.6, 0.5, 0.3333),
      ("es", 300L, 0.3, 0.25, 0.3333)), r.mkString(", "))
    // degenerate case: target names no observed stratum → rate 0, not null
    val zero = Corpus.mixWeights(df, "lang", Map("zh" -> 1.0))
      .select("sample_rate").as[Double].collect()
    assert(zero.length == 3 && zero.forall(_ == 0.0), zero.mkString(", "))
  }

  test("curationFunnel survives empty and all-whitespace docs") {
    val df = Seq((1L, ""), (2L, " " * 200), (3L, "tiny")).toDF("doc_id", "text")
    val r = Corpus.curationFunnel(df, "doc_id", "text")
      .orderBy("stage").select("stage", "n_docs")
      .as[(String, Long)].collect()
    // 1 and 3 fail the char band; the 200-space doc passes it with zero
    // words (word-len stage is null → falls through) and rejects on lang
    assert(r.toSeq == Seq(("1_length", 2L), ("3_lang", 1L)), r.mkString(", "))
  }

  test("packSequences assigns packs by per-shard running token count") {
    val df = Seq(
      (0L, "a b c"),       // shard 0: 3 tokens, cum 0 → pack 0, offset 0
      (2L, "d e f g"),     // shard 0: 4 tokens, cum 3 → pack 0, offset 3
      (4L, "h i"),         // shard 0: cum 7 → pack 1, offset 1 (budget 6)
      (1L, "x y z w v u")  // shard 1: 6 tokens, cum 0 → pack 0, offset 0
    ).toDF("doc_id", "text")
    val r = Corpus.packSequences(df, "doc_id", "text", budget = 6, nShards = 2)
      .orderBy("doc_id")
      .select("doc_id", "shard", "pack_id", "n_tokens", "pack_offset")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(r(0) == ((0L, 0, 0L, 3L, 0L)))
    assert(r(1) == ((1L, 1, 0L, 6L, 0L)))
    assert(r(2) == ((2L, 0, 0L, 4L, 3L)))
    assert(r(3) == ((4L, 0, 1L, 2L, 1L)))
  }

  test("curationFunnel attributes each doc to its first failing stage") {
    val kept = "the alpha and bravo of charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu extra filler words"
    val shortWords = ("a b " * 50).trim                 // avg word len 1 < 3
    val noLang = ("qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss ddd fff " +
      "ggg hhh jjj kkk lll zzz xxx ccc vvv bbb nnn mmm").trim
    val repetitive = "the spam and spam of " + ("spam " * 30).trim
    val df = Seq(
      (1L, kept),        // survives all stages
      (2L, "tiny text"), // < 100 chars → 1_length
      (3L, shortWords),  // avg word len below band → 2_word_len
      (4L, noLang),      // no language marker fires → 3_lang
      (5L, repetitive)   // top-word share 0.91 → 4_repetition
    ).toDF("doc_id", "text")
    val r = Corpus.curationFunnel(df, "doc_id", "text")
      .orderBy("stage")
      .select("stage", "n_docs", "doc_share")
      .as[(String, Long, Double)].collect()
    assert(r.toSeq == Seq(
      ("0_kept", 1L, 0.2), ("1_length", 1L, 0.2), ("2_word_len", 1L, 0.2),
      ("3_lang", 1L, 0.2), ("4_repetition", 1L, 0.2)), r.mkString(", "))
    // the per-doc surface attributes each doc to the same stage
    val perDoc = Corpus.curationDecisions(df, "doc_id", "text")
      .orderBy("doc_id").select("stage").as[String].collect()
    assert(perDoc.toSeq == Seq(
      "0_kept", "1_length", "2_word_len", "3_lang", "4_repetition"))
  }

  test("classifierScore: mean token weight + bias, unseen terms weigh zero") {
    val docs = Seq(
      (1L, "good good bad"),   // (2*1.0 + 1*(-1.0))/3 + 0.5 = 0.8333
      (2L, "novel words only"),// all unseen -> bias
      (3L, "")                 // no words -> drops
    ).toDF("doc_id", "text")
    val weights = Seq(("good", 1.0), ("bad", -1.0)).toDF("term", "weight")
    val r = Corpus.classifierScore(docs, "doc_id", "text", weights, bias = 0.5)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 3L, 0.8333), (2L, 3L, 0.5)), r.mkString(", "))
  }

  test("applyMixRates: whole rates copy exactly, zero drops, fraction is deterministic") {
    val df = (0L until 40L).map(i =>
      (i, Seq("a", "b", "c")(math.floorMod(i, 3).toInt))).toDF("doc_id", "stratum")
    val out = Corpus.applyMixRates(df, "doc_id", "stratum",
        Map("a" -> 2.0, "b" -> 0.0, "c" -> 1.5))
      .select("doc_id", "stratum", "epoch")
      .as[(Long, String, Int)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val strata = df.as[(Long, String)].collect().toMap
    // every 'a' doc exactly twice (epochs 0,1); no 'b' doc survives
    strata.foreach { case (id, s) =>
      if (s == "a") assert(byDoc(id) == Seq(0, 1), s"doc $id: ${byDoc.get(id)}")
      if (s == "b") assert(!byDoc.contains(id), s"doc $id should be dropped")
    }
    // 'c' multiplicity re-derives from the same hash bucket the operator uses
    val buckets = df.select($"doc_id", Corpus.hashBucket($"doc_id").as("b"))
      .as[(Long, Long)].collect().toMap
    strata.filter(_._2 == "c").foreach { case (id, _) =>
      val expected = if (buckets(id) < 2048) Seq(0, 1) else Seq(0)
      assert(byDoc(id) == expected, s"doc $id bucket ${buckets(id)}: ${byDoc.get(id)}")
    }
  }

  test("trainingOrder: seeded permutation is total, contiguous, and seed-sensitive") {
    val df = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val once = Corpus.trainingOrder(df, "doc_id", seed = 7, nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    val again = Corpus.trainingOrder(df, "doc_id", seed = 7, nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(once.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq,
      "same seed must reproduce the same order")
    // every row addressed exactly once; positions contiguous from 1 per shard
    assert(once.map(_._1).toSet == (0L until 100L).toSet)
    once.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    val other = Corpus.trainingOrder(df, "doc_id", seed = 8, nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(once.sortBy(_._1).toSeq != other.sortBy(_._1).toSeq,
      "a different seed must permute differently")
  }

  test("perplexityBuckets splits head/middle/tail on thresholds, map-side") {
    val scored = (1 to 90).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "s")
    val b = Corpus.perplexityBuckets(scored, "s", 3)
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    // uniform scores → thirds; strict-> chain sends boundary ties down
    assert(b(10L) == 1 && b(45L) == 2 && b(80L) == 3)
    val sizes = b.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.forall(n => n >= 28 && n <= 32), s"unbalanced: $sizes")
    // no window/exchange on the assignment side: boundaries are literals
    val plan = Corpus.perplexityBuckets(scored, "s", 3)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), "bucket assignment must not use a window")
  }

  test("DSIR weights rank target-like docs higher; hashed variant matches exactly when collision-free") {
    val docs = Seq(
      (1L, "wiki", "science method experiment theory science"),
      (2L, "wiki", "theory experiment method analysis"),
      (3L, "web", "click here buy now cheap deals"),
      (4L, "web", "science theory buy cheap"),
      (5L, "web", "buy buy cheap cheap now")
    ).toDF("doc_id", "source", "text")
    val target = docs.filter($"source" === "wiki")
    val w = Corpus.importanceWeights(docs, target, "doc_id", "text")
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    // target docs and target-like docs must outrank pure off-domain docs
    assert(w(1L) > w(3L) && w(2L) > w(5L) && w(4L) > w(5L))
    // a collision-free bucket space reproduces the word-space weights
    val hashed = Corpus.importanceWeightsHashed(docs, target, "doc_id", "text",
        nBuckets = 1 << 22)
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    assert(hashed == w, s"hashed-feature weights diverged: $hashed vs $w")
    // the paper's 10k default still runs (collisions allowed) and keeps
    // one row per doc
    assert(Corpus.importanceWeightsHashed(docs, target, "doc_id", "text")
      .count() == 5)
  }

  test("trainingOrder interleaves applyMixRates epoch copies via extraKeyCols") {
    val df = (0L until 40L).map(i =>
      (i, Seq("a", "b", "c")(math.floorMod(i, 3).toInt))).toDF("doc_id", "stratum")
    val mixed = Corpus.applyMixRates(df, "doc_id", "stratum",
      Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
    val ordered = Corpus.trainingOrder(mixed, "doc_id", seed = 3, nShards = 4,
        extraKeyCols = Seq("epoch"))
      .select("doc_id", "epoch", "shard", "pos")
      .as[(Long, Int, Int, Long)].collect()
    // a total address assignment: every (doc, epoch) copy exactly once
    assert(ordered.length == mixed.count())
    assert(ordered.map(r => (r._1, r._2)).distinct.length == ordered.length)
    // epoch copies hash independently: they must not systematically land
    // back-to-back in the same shard
    val copies = ordered.groupBy(_._1).filter(_._2.length == 2).values.toSeq
    assert(copies.nonEmpty, "rate 2.0 must produce doubled docs")
    val adjacent = copies.count { rs =>
      rs(0)._3 == rs(1)._3 && math.abs(rs(0)._4 - rs(1)._4) == 1 }
    assert(adjacent < copies.size,
      s"$adjacent of ${copies.size} copy-pairs adjacent — epochs not interleaved")
  }

  test("heavyHitters: exact counts at the n/k threshold, any partitioning") {
    // a ×40, b ×20, c ×5, w1..w25 ×1 → n = 90
    val df = Seq(
      (1L, Seq.fill(30)("a").mkString(" ")),
      (2L, (Seq.fill(10)("a") ++ Seq.fill(20)("b")).mkString(" ")),
      (3L, (Seq.fill(5)("c") ++ (1 to 25).map(i => s"w$i")).mkString(" "))
    ).toDF("doc_id", "text")
    // differential: both physical routes are exact under any partitioning
    for (parts <- Seq(1, 5, 13); route <- Seq("mg", "onepass")) {
      val r = Corpus.heavyHitters(df.repartition(parts), "doc_id", "text",
          k = 8, route = route)
        .as[(String, Long)].collect().toSeq
      // freq·8 > 90 → freq > 11.25 → a(40), b(20); c and singletons excluded
      assert(r == Seq(("a", 40L), ("b", 20L)),
        s"parts=$parts route=$route: $r")
    }
    // tighter k = 3: threshold n/3 = 30 → only a (40) qualifies
    val top = Corpus.heavyHitters(df, "doc_id", "text", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 40L)))
    // k = 2: threshold 45 — nothing reaches it, exact answer is empty
    assert(Corpus.heavyHitters(df, "doc_id", "text", k = 2).isEmpty)
    // plan shape: the MG confirm pass broadcasts the candidate set — the
    // exploded token stream joins map-side, text never shuffles
    val plan = Corpus.heavyHitters(df, "doc_id", "text", k = 8, route = "mg")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidates not broadcast in confirm pass:\n$plan")
  }

  test("heavyHitters: auto route picks one-pass on closed vocab, MG on open") {
    // closed vocabulary: tiny NDV however many docs → one-pass
    val closed = (1 to 3000).map(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    assert(Corpus.chooseHeavyHitterRoute(closed, "text",
      onePassMaxVocab = 2000000L) == "onepass")
    // open vocabulary (every doc mints fresh tokens): the sample slope
    // projects a vocabulary past the one-pass budget → MG, the
    // guaranteed-bounded shape. Must sit ABOVE the probe-skip floor —
    // smaller corpora route one-pass without probing at all.
    val nOpen = Corpus.HeavyHitterProbeMinDocs + 5000
    val open = (1 to nOpen).map(i =>
        (i.toLong, (1 to 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Corpus.chooseHeavyHitterRoute(open, "text",
      onePassMaxVocab = 1000L) == "mg")
    // below the floor the probe is skipped: even a fully open vocabulary
    // routes one-pass (correct either way — one-pass is exact)
    val tinyOpen = (1 to 3000).map(i =>
        (i.toLong, (1 to 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Corpus.chooseHeavyHitterRoute(tinyOpen, "text",
      onePassMaxVocab = 1000L) == "onepass")
    // and the routed call stays exact either way
    val r = Corpus.heavyHitters(closed, "doc_id", "text", k = 4)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("the", 6000L)), s"got $r") // 6000·4 > 18000
  }

  test("heavyHitters: bounded candidate state under a wide vocabulary") {
    // 400 distinct singletons + one genuinely heavy token; k = 8 keeps
    // per-partition state at 8 counters and the exact pass still lands
    val noise = (1 to 400).map(i => (i.toLong, s"n$i x$i y$i"))
    val heavy = (401 to 500).map(i => (i.toLong, "hot hot hot hot hot hot"))
    val df = (noise ++ heavy).toDF("doc_id", "text").repartition(11)
    val r = Corpus.heavyHitters(df, "doc_id", "text", k = 8, route = "mg")
      .as[(String, Long)].collect().toSeq
    // n = 1200 + 600 = 1800; hot = 600 → 600·8 > 1800 ✓; all noise ≤ 1
    assert(r == Seq(("hot", 600L)), s"got $r")
  }

  test("heavyHitters: eviction-pressure adversary keeps a just-over-threshold hitter") {
    // One partition, k=4: a heavy token at frequency barely above n/k,
    // interleaved with a flood of distinct singletons that forces many
    // summary purges. The retired "deferred decrement" sweep charged
    // would-be-insertions as debt against live counters and evicted the
    // true hitter here; the batched-median purge must keep it (total
    // subtraction ≤ n_p/k < freq).
    val fillers = (1 to 40).map(i => s"f$i")
    // interleave: h f1 f2 f3 h f4 f5 f6 h ... → h ×14, fillers ×40, n = 54
    val words = fillers.grouped(3).zipWithIndex.flatMap { case (g, _) =>
      "h" +: g
    }.toSeq ++ Seq.fill(14 - (40 + 2) / 3)("h")
    val hCount = words.count(_ == "h")
    val n = words.size
    assert(hCount * 4 > n, s"fixture broken: $hCount*4 <= $n")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text").coalesce(1)
    val r = Corpus.heavyHitters(df, "doc_id", "text", k = 4, route = "mg")
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("h", hCount.toLong)), s"got $r, expected h x$hCount of n=$n")
  }

  test("heavyHitters differential: equals exact groupBy counts on skewed random text") {
    import org.apache.spark.sql.functions.{col, desc, explode, split}
    // seeded zipf-ish corpus: token t_j appears ~ 1/j as often; exact
    // answer computed independently with a plain aggregate
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 300).map(j => s"t$j")
    val docs = (1 to 200).map { i =>
      val words = (1 to 60).map { _ =>
        val j = math.min(300, (1 / math.max(1e-6, rnd.nextDouble())).toInt)
        vocab(math.min(j, 300) - 1)
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val n = toks.count()
    for (k <- Seq(4, 16, 64)) {
      val exact = toks.groupBy("token").count()
        .filter(col("count") * k > n)
        .orderBy(desc("count"), col("token"))
        .as[(String, Long)].collect().toSeq
      val got = Corpus.heavyHitters(docs.repartition(9), "doc_id", "text", k)
        .as[(String, Long)].collect().toSeq
      assert(got == exact, s"k=$k: got ${got.take(5)}... expected ${exact.take(5)}...")
    }
  }

  test("contaminationAtScale output equals the exact broadcast contamination") {
    // docs sharing 3-grams with the benchmark slice plus clean docs
    val df = (0L until 60L).map { i =>
      val base =
        if (i % 3 == 0) s"shared trigram block $i plus unique tail $i"
        else s"totally unrelated words number $i nothing common here $i"
      (i, base)
    }.toDF("doc_id", "text")
    val bench = Seq((1000L, "shared trigram block 0 plus unique tail 0 and " +
      "shared trigram block 3")).toDF("doc_id", "text")
    val corpus = df
    val exact = Corpus.contamination(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    val scaled = Corpus.contaminationAtScale(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(scaled == exact, "bloom-prefiltered result diverged from exact join")
    assert(exact.count(_._3) >= 2, "fixture produced no contaminated docs")
  }
}
