package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy dog", "en"),   // exact dup of 0
    (2L, "the quick brown fox jumped over the lazy dog!", "en"), // near dup
    (3L, "completely different content about databases and query engines", "en"),
    (4L, "el rapido zorro marron salta sobre el perro", "es")
  ).toDF("doc_id", "text", "lang")

  test("exactDedup groups identical texts under one representative") {
    val d = Dedup.exactDedup(docs, "doc_id", "text")
    assert(d.count() == 4) // 5 docs, one exact pair
    val dup = d.filter($"n_dups" === 2).select("keep_id").as[Long].head()
    assert(dup == 0L)
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    val variants = Seq((0L, "Hello, World!"), (1L, "hello world"), (2L, "HELLO   WORLD??")).toDF("doc_id", "text")
    val fps = Dedup.fingerprint(variants, "doc_id", "text").select("fp").distinct()
    assert(fps.count() == 1)
  }

  test("minhash signatures are deterministic and equal for identical docs") {
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 5, 8)
    assert(sigs.filter($"doc_id" === 0L).count() == 8)
    val s0 = sigs.filter($"doc_id" === 0L).orderBy("seed").select("sig").as[String].collect()
    val s1 = sigs.filter($"doc_id" === 1L).orderBy("seed").select("sig").as[String].collect()
    assert(s0.toSeq == s1.toSeq)
  }

  test("minhash LSH surfaces exact and near duplicates as candidate pairs") {
    val pairs = Dedup.minHashCandidatePairs(docs, "doc_id", "text", 5, 8, 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))        // exact dup always collides
    assert(!pairs.contains((0L, 4L)))       // cross-language unrelated
  }

  test("simhash: identical docs equal, unrelated docs differ") {
    val sh = Dedup.simHash32(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(1L))
    assert(sh(0L) != sh(3L))
    // near-dup has small hamming distance
    val ham = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(ham <= 10, s"hamming $ham too large for near-dup")
  }

  test("simHashPairs banding is exact: equals the brute-force hamming join") {
    val sh = Dedup.simHash32(docs, "doc_id", "text").as[(Long, Long)].collect()
    val brute = (for {
      (ia, fa) <- sh; (ib, fb) <- sh if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    val banded = Dedup.simHashPairs(docs, "doc_id", "text", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute, s"banded=$banded brute=$brute")
    assert(banded.exists { case (a, b, h) => a == 0L && b == 1L && h == 0 },
      "exact dup pair must survive at hamming 0")
  }

  test("pair generation from persisted signatures matches end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sig").toString
    Dedup.bandBuckets(docs, "doc_id", "text", 5, 8, 2)
      .write.mode("overwrite").parquet(s"$dir/bands")
    val fromDisk = Dedup.candidatePairsFromBands(
        spark.read.parquet(s"$dir/bands"), "doc_id")
      .as[(Long, Long)].collect().toSet
    val endToEnd = Dedup.minHashCandidatePairs(docs, "doc_id", "text", 5, 8, 2)
      .as[(Long, Long)].collect().toSet
    assert(fromDisk == endToEnd)
    Dedup.simHash32(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/fp")
    val shFromDisk = Dedup.simHashPairsFrom(
        spark.read.parquet(s"$dir/fp"), "doc_id", 3)
      .as[(Long, Long, Int)].collect().toSet
    val shEndToEnd = Dedup.simHashPairs(docs, "doc_id", "text", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(shFromDisk == shEndToEnd)
  }

  test("incrementalDedup admits exactly the non-colliding batch docs") {
    val corpus = docs.filter($"doc_id" === 0L)
    val batch = docs.filter($"doc_id" =!= 0L)
    val admitted = Dedup.incrementalDedup(batch, "doc_id", "text",
        Dedup.bandBuckets(corpus, "doc_id", "text", 5, 8, 2), 5, 8, 2)
      .select("doc_id").as[Long].collect().toSet
    // differential expectation from the full-set candidate pairs
    val pairs = Dedup.minHashCandidatePairs(docs, "doc_id", "text", 5, 8, 2)
      .as[(Long, Long)].collect().toSet
    val batchIds = Set(1L, 2L, 3L, 4L)
    val expected = batchIds.filter { i =>
      val hitsCorpus = pairs.exists { case (a, b) =>
        (a == i && b == 0L) || (b == i && a == 0L) }
      val hitsSmallerBatch = pairs.exists { case (a, b) =>
        b == i && batchIds(a) }
      !hitsCorpus && !hitsSmallerBatch
    }
    assert(admitted == expected, s"admitted=$admitted expected=$expected")
    assert(!admitted.contains(1L), "exact dup of a corpus doc must be dropped")
    assert(admitted.contains(3L) && admitted.contains(4L))
  }

  test("dedupCorpusBest keeps the highest-scoring member per group") {
    val scored = docs.withColumn("score", $"doc_id".cast("double"))
    val kept = Dedup.dedupCorpusBest(scored, "doc_id", "text", "score")
      .select("doc_id").as[Long].collect().toSet
    val groups = Dedup.dedupGroups(docs, "doc_id", "text", 5, 8, 2)
      .as[(Long, Long)].collect()
    val expected = groups.groupBy(_._2).values
      .map(members => members.map(_._1).maxBy(i => (i.toDouble, -i)))
      .toSet
    assert(kept == expected, s"kept=$kept expected=$expected")
    // docs 0/1/2 form one near-dup group: with score = id the highest-id
    // member represents it — never doc 0, exactly one of the three kept
    assert(!kept.contains(0L) && kept.intersect(Set(0L, 1L, 2L)).size == 1)
  }

  test("winnowing: shared substring of length >= w+k-1 shares a fingerprint") {
    val a = (0L, "aaaa THE QUICK BROWN FOX bbbb")
    val b = (1L, "cccc THE QUICK BROWN FOX dddd") // 20-char shared run > w+k-1=8
    val c = (2L, "totally unrelated content here")
    val fps = Dedup.winnowingFingerprints(
        Seq(a, b, c).toDF("doc_id", "text"), "doc_id", "text", 5, 4)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(0L) intersect fps(1L)).nonEmpty, "shared run must share a print")
    assert((fps(0L) intersect fps(2L)).isEmpty)
  }

  test("ngram jaccard: dup pair ~1.0, near-dup high, unrelated low") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 3, 20, 0.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j((0L, 2L)) > 0.6)
    assert(j.getOrElse((0L, 3L), 0.0) < 0.2)
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosineTopK ranks by similarity with deterministic tie-break") {
    val q = vecs.filter($"vec_id" === 0L).select($"embedding".as("qvec"))
    val top = Similarity.cosineTopK(vecs, "vec_id", "embedding", q, 3)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 0L && top.head._2 == 1.0)
    assert(top(1)._1 == 1L)
  }

  test("nearDupPairs respects the group bound and threshold") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
  }

  test("lshNearDupPairs finds close vectors without a label column") {
    val pairs = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding", 4, 0.9, nBits = 2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).contains((0L, 1L)))
  }

  test("lshBucket is deterministic; annTopK finds the query's bucket-mates") {
    val b1 = vecs.withColumn("b", Similarity.lshBucket(col("embedding"), 4, 8))
      .select("vec_id", "b").as[(Long, Long)].collect().toMap
    val b2 = vecs.withColumn("b", Similarity.lshBucket(col("embedding"), 4, 8))
      .select("vec_id", "b").as[(Long, Long)].collect().toMap
    assert(b1 == b2)
    val q = vecs.filter($"vec_id" === 0L).select($"embedding".as("qvec"))
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding", 4, q, 3, nBits = 4)
      .as[(Long, Double)].collect()
    assert(ann.nonEmpty && ann.head._1 == 0L) // query vector is its own nearest
  }

  test("semanticDedup groups near-identical embeddings, keeps min id per group") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)),  // near-dup of 1 (cosine ≈ 1)
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.99f, 0.01f)),  // near-dup of 3
      (5L, Array(0.0f, 0.0f, 1.0f))     // singleton survivor
    ).toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(df, "vec_id", "embedding",
        nLists = 3, threshold = 0.95)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)].collect()
    assert(r.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 3L, true), (4L, 3L, false),
      (5L, 5L, true)), r.mkString(", "))
    // deterministic under the fixed seed
    val again = Similarity.semanticDedup(df, "vec_id", "embedding", 3, 0.95)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect()
    assert(r.toSeq == again.toSeq)
  }
}
