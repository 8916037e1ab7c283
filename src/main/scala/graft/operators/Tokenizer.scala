package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Learned BPE tokenization — the tokenizer-TRAINING half of the corpus
  * pipeline ([[graft.functions.TextFunctions]] counts tokens with a fixed
  * GPT-2-ish pre-tokenization; this module learns the merge table a real
  * tokenizer ships with, then applies it).
  *
  * Scale shape (how real BPE trainers work): the corpus is touched ONCE —
  * a distributed pre-tokenize + piece-frequency aggregate whose result is
  * the (piece, count) dictionary, bounded to the `maxPieces` most
  * frequent pieces. Merge learning then iterates over THAT dictionary on
  * the driver: at web scale the dictionary is millions of rows where the
  * corpus is trillions of tokens, and every merge iteration touches only
  * the pieces containing the merged pair (incremental pair-count
  * maintenance), so training cost is independent of corpus size past the
  * one counting pass. Encoding is a partition-local kernel with the
  * (small) rank table in the closure — no shuffle.
  *
  * Determinism: ties on pair frequency break lexicographically, piece
  * truncation ties break lexicographically, so the same corpus always
  * yields the same merge table regardless of partitioning.
  */
object Tokenizer {

  /** GPT-2-style pre-tokenization pieces: contraction suffixes, space-
    * prefixed letter runs, digit runs, punctuation runs (the same class
    * of pattern the x_bpe_tokens oracle row uses). The punctuation run
    * INCLUDES the apostrophe (as GPT-2's `[^\s\p{L}\p{N}]+` does):
    * the contraction branch claims `'ll/'ve/'re/'s/...` first, and any
    * OTHER apostrophe must still surface as a piece — an excluded `'`
    * was silently dropped from the stream, breaking encode()'s
    * losslessness on text like `rock 'n roll`. */
  val PiecePattern: String =
    "(?:'(?:ll|ve|re|[sdmt]))| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** Distributed (piece, count) dictionary — the single corpus pass.
    * Bounded: top `maxPieces` by count (ties lexicographic). */
  def pieceCounts(df: DataFrame, textCol: String, maxPieces: Int): Seq[(String, Long)] = {
    val counts = df
      .select(explode(regexp_extract_all(col(textCol), lit(PiecePattern), lit(0)))
        .as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("piece"))
      .limit(maxPieces)
    counts.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
  }

  /** Learn `numMerges` BPE merges from the piece dictionary. Each piece
    * starts as its character symbols; every round merges the globally
    * most frequent adjacent symbol pair (count weighted by piece
    * frequency, ties lexicographic on the pair) and stops early when no
    * pair repeats. Incremental: a merge re-counts only the pieces that
    * contain the pair. */
  def learnMerges(dictionary: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[(mutable.ArrayBuffer[String], Long)] = dictionary.map {
      case (piece, n) => (mutable.ArrayBuffer(piece.map(_.toString): _*), n)
    }.toArray
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addPair(p: (String, String), n: Long, w: Int): Unit = {
      pairCounts.updateWith(p) { c => Some(c.getOrElse(0L) + n) }
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += w
      ()
    }
    def removePair(p: (String, String), n: Long): Unit = {
      pairCounts.updateWith(p) {
        case Some(c) if c > n => Some(c - n)
        case _ => None
      }
      ()
    }
    words.zipWithIndex.foreach { case ((syms, n), w) =>
      syms.indices.dropRight(1).foreach(i => addPair((syms(i), syms(i + 1)), n, w))
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < numMerges && pairCounts.nonEmpty) {
      // highest count wins; ties take the lexicographically smallest pair
      val maxCount = pairCounts.valuesIterator.max
      if (maxCount < 2) return merges.toSeq // nothing repeats — done
      val pair = pairCounts.collect { case (p, c) if c == maxCount => p }
        .minBy(identity)
      merges += pair
      val merged = pair._1 + pair._2
      val affected = pairWords.getOrElse(pair, mutable.Set.empty).toSeq
      affected.foreach { w =>
        val (syms, n) = words(w)
        // drop this word's old pair contributions, rebuild after merging
        val oldPairs = syms.indices.dropRight(1).map(i => (syms(i), syms(i + 1)))
        oldPairs.foreach(p => removePair(p, n))
        var i = 0
        while (i < syms.length - 1) {
          if (syms(i) == pair._1 && syms(i + 1) == pair._2) {
            syms(i) = merged
            syms.remove(i + 1)
          } else i += 1
        }
        val newPairs = syms.indices.dropRight(1).map(i => (syms(i), syms(i + 1)))
        newPairs.foreach(p => addPair(p, n, w))
        // un-index the word from pairs it no longer contains: a stale
        // entry makes every later selection of that pair pay a full
        // teardown/rebuild of this word for nothing — the inverted
        // index only ever grew
        (oldPairs.toSet -- newPairs.toSet).foreach { p =>
          pairWords.get(p).foreach { ws =>
            ws -= w
            if (ws.isEmpty) pairWords.remove(p)
          }
        }
      }
      pairWords.remove(pair)
    }
    merges.toSeq
  }

  /** One-call training: corpus pass + driver merge loop. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxPieces: Int = 65536): Seq[(String, String)] =
    learnMerges(pieceCounts(df, textCol, maxPieces), numMerges)

  /** Segment one pre-tokenized piece with a learned rank table: always
    * merge the present pair with the LOWEST rank first (exactly how GPT-2
    * style encoders apply their merge table). O(len²·log) worst case on a
    * single piece — pieces are words, so short. */
  private[operators] def segment(piece: String,
                                 ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = piece.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      val best = syms.indices.dropRight(1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))).map(r => (r, i)))
        .sortBy(identity).headOption
      best match {
        case Some((_, i)) =>
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
          done = syms.length < 2
        case None => done = true
      }
    }
    syms
  }

  /** Encode documents with a learned merge table: (id, tokens, n_tokens).
    * Partition-local (rank table in the closure — a merge table is a few
    * hundred KB at vocabulary scale), no shuffle; segmentation is
    * LOSSLESS — concatenating `tokens` reproduces the pre-tokenized
    * pieces, whose concatenation reproduces the text minus the
    * inter-piece whitespace the pre-tokenizer drops. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val re = PiecePattern.r
    // Option id: a null id must surface as a null-id output row, not
    // crash the tuple encoder mid-job
    df.select(col(idCol).cast("long"), col(textCol)).as[(Option[Long], String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val pieces = re.findAllIn(if (text == null) "" else text).toSeq
          val tokens = pieces.flatMap(p => segment(p, ranks))
          (id, tokens, tokens.length)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }
}
