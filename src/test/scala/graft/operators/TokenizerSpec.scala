package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Learned BPE ([[Tokenizer]]): golden merges on the classic fixture,
  * lossless segmentation, monotone compression, determinism. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the classic BPE example's first merges") {
    // Sennrich-style dictionary: ("low" ×5, "lower" ×2, "newest" ×6,
    // "widest" ×3). Pair counts: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ...
    // Round 1 ties (e,s)/(s,t) at 9 → lexicographic → (e,s);
    // round 2: (es,t)=9; round 3: (l,o)=7 vs (est...)
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Tokenizer.learnMerges(dict, 4)
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("l", "o")),
      s"got $merges")
    // 4th round: (lo,w)=7 vs (n,e)=6 vs (w,i)=3 ... → (lo,w)
    assert(merges(3) == (("lo", "w")))
  }

  test("segment applies ranks lowest-first and is lossless") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val ranks = merges.zipWithIndex.toMap
    assert(Tokenizer.segment("lowest", ranks) == Seq("low", "est"))
    assert(Tokenizer.segment("low", ranks) == Seq("low"))
    assert(Tokenizer.segment("xyz", ranks) == Seq("x", "y", "z"))
    assert(Tokenizer.segment("", ranks).isEmpty ||
      Tokenizer.segment("", ranks) == Seq(""))
  }

  test("train + encode: lossless, monotone in merge count, deterministic") {
    val docs = Seq(
      (1L, "the lowest land below the lower lowlands"),
      (2L, "newest tests attest the widest west"),
      (3L, "below below below the west winds 42 times!"))
      .toDF("doc_id", "text")
    val merges = Tokenizer.train(docs, "text", numMerges = 30, maxPieces = 1000)
    assert(merges.nonEmpty && merges.size <= 30)
    assert(merges == Tokenizer.train(docs, "text", 30, 1000), "nondeterministic")

    val enc = Tokenizer.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    // lossless: concatenated tokens == concatenated pre-tokenized pieces
    val re = Tokenizer.PiecePattern.r
    docs.orderBy("doc_id").collect().zip(enc).foreach { case (d, e) =>
      val pieces = re.findAllIn(d.getString(1)).mkString
      assert(e.getSeq[String](1).mkString == pieces,
        s"doc ${d.getLong(0)} segmentation lost content")
      assert(e.getInt(2) == e.getSeq[String](1).length)
    }
    // more merges never increase the token count
    val enc0 = Tokenizer.encode(docs, "doc_id", "text", Seq.empty)
      .agg(sum("n_tokens")).head().getLong(0)
    val enc10 = Tokenizer.encode(docs, "doc_id", "text", merges.take(10))
      .agg(sum("n_tokens")).head().getLong(0)
    val encAll = Tokenizer.encode(docs, "doc_id", "text", merges)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(enc0 >= enc10 && enc10 >= encAll, s"$enc0 / $enc10 / $encAll")
    assert(encAll < enc0, "merges compressed nothing")
  }

  test("pieceCounts bounds the dictionary and orders ties deterministically") {
    val docs = Seq((1L, "aa bb aa cc bb aa")).toDF("id", "text")
    val pc = Tokenizer.pieceCounts(docs, "text", maxPieces = 2)
    // pieces: "aa" ×1 (no leading space) + " aa" ×2, " bb" ×2, " cc" ×1...
    assert(pc.size == 2)
    assert(pc.head._2 >= pc.last._2)
    val all = Tokenizer.pieceCounts(docs, "text", maxPieces = 100)
    assert(all.map(_._1).contains(" aa") && all.map(_._1).contains("aa"))
  }
}
