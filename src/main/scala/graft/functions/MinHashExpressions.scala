package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernel (the hot loop of the dedup pipeline —
  * reference analog: the vectorized scan kernels in
  * bundles/sirix-query/src/main/java/io/sirix/query/compiler/vectorized/).
  *
  * Semantics are EXACTLY the SQL formulation in
  * [[graft.operators.Dedup.wideSignatures]]'s scaladoc — md5 hex of every
  * `k`-code-point shingle, signature `r` = lexicographic min of the digest
  * rotated by `4·r` hex chars — so results stay bit-identical to the
  * DuckDB oracle. The win is constant-factor: one tight JIT'd loop per
  * document (digest reused across all rotations, mins tracked as byte
  * arrays, rotation compared in place by offset) instead of interpreted
  * higher-order lambdas materializing a rotated string per shingle per
  * rotation.
  */
object MinHashExpressions {

  case class MinHashSigs(child: Expression, shingleLen: Int, numHashes: Int)
      extends UnaryExpression {

    require(shingleLen >= 1, s"shingleLen must be positive: $shingleLen")
    require(numHashes >= 1 && numHashes <= 8, "numHashes must be in 1..8")

    override def prettyName: String = "graft_minhash_sigs"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true // docs shorter than k have no shingle

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      MinHashKernel.sigs(t.asInstanceOf[UTF8String], shingleLen, numHashes)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.MinHashKernel.sigs($c, $shingleLen, $numHashes);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<string>` of `numHashes` signatures; null when the text has no
    * `shingleLen`-code-point shingle. */
  def minHashSigs(text: Column, shingleLen: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashSigs(GraftBridge.expression(text), shingleLen, numHashes))

  /** 32-bit SimHash over whitespace(space)-split tokens, one pass per doc.
    * Bit-identical to the aggregate formulation (and the DuckDB oracle):
    * bit `i` of md5(token) is nibble `i/4`, bit `i%4`; the fingerprint
    * sets bit `i` where the signed vote across tokens is strictly
    * positive. Null when the text has no token — matching the exploded
    * formulation, where tokenless docs produce no row. */
  case class SimHash32Expr(child: Expression) extends UnaryExpression {

    override def prettyName: String = "graft_simhash32"
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      MinHashKernel.simhash32(t.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        // fresh name: a fixed local would collide (Janino redefinition →
        // silent interpreted fallback) when the expression appears twice
        // in one codegen scope with non-nullable children
        val r = ctx.freshName("simhashRes")
        s"""
           |java.lang.Long $r = graft.functions.MinHashKernel.simhash32($c);
           |${ev.isNull} = ($r == null);
           |${ev.value} = ${ev.isNull} ? 0L : $r.longValue();
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simHash32(text: Column): Column =
    GraftBridge.column(SimHash32Expr(GraftBridge.expression(text)))

  /** Winnowing fingerprints (MOSS scheme), one pass per doc: md5 every
    * `k`-code-point gram, keep the min of each sliding window of `w`
    * consecutive gram hashes, return the DISTINCT selected prints.
    * Bit-identical to the explode + window-min + distinct formulation.
    * Null when the text has no `k`-gram. */
  case class WinnowingPrints(child: Expression, k: Int, w: Int)
      extends UnaryExpression {

    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")

    override def prettyName: String = "graft_winnowing"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      MinHashKernel.winnow(t.asInstanceOf[UTF8String], k, w)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.MinHashKernel.winnow($c, $k, $w);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def winnowingPrints(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowingPrints(GraftBridge.expression(text), k, w))

  /** Per-document repetition statistics in one pass: word count, the most
    * frequent word (ties → smallest in binary UTF-8 order, matching
    * `row_number over (desc cnt, asc w)`), its count, and the distinct
    * adjacent word-2-gram count. Null when the text has no word. The
    * per-doc hash maps bound memory by document size, never corpus
    * size. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {

    override def prettyName: String = "graft_repetition_stats"
    override def dataType: DataType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("top_word", StringType, nullable = false),
      StructField("top_cnt", LongType, nullable = false),
      StructField("n_distinct_2grams", LongType, nullable = false)))
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      MinHashKernel.repetitionStats(t.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.MinHashKernel.repetitionStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def repetitionStats(text: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(text)))

  /** md5 hex of every `n`-word gram (words space-split, grams joined with
    * a single space), in position order — `posexplode` over the result
    * reproduces the (pos, hash) stream of the transform/array_join
    * formulation. With `dedup` the per-doc first-occurrence distinct set
    * is returned instead (for overlap tests that count distinct grams).
    * Null when the text has fewer than `n` words. */
  case class WordGramHashes(child: Expression, n: Int, dedup: Boolean)
      extends UnaryExpression {

    require(n >= 1, s"n must be positive: $n")

    override def prettyName: String = "graft_word_gram_hashes"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      MinHashKernel.wordGramHashes(t.asInstanceOf[UTF8String], n, dedup)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.MinHashKernel.wordGramHashes($c, $n, $dedup);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def wordGramHashes(text: Column, n: Int, dedup: Boolean = false): Column =
    GraftBridge.column(WordGramHashes(GraftBridge.expression(text), n, dedup))

  /** Per-doc word histogram: `array<struct<w, cnt>>` in first-occurrence
    * order — `explode` over it replaces a (doc, word) count aggregate
    * with map-side work (the pairs are unique per doc by construction).
    * Null when the text has no word. */
  case class WordCounts(child: Expression) extends UnaryExpression {

    override def prettyName: String = "graft_word_counts"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      MinHashKernel.wordCounts(t.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.MinHashKernel.wordCounts($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def wordCounts(text: Column): Column =
    GraftBridge.column(WordCounts(GraftBridge.expression(text)))

  /** Per-doc character-bigram histogram: `array<struct<g, cnt>>` in
    * first-occurrence order (bigram = 2 consecutive SQL characters, the
    * `substring(text, i, 2)` stepping). Null when the text has fewer than
    * 2 characters. */
  case class CharBigramCounts(child: Expression) extends UnaryExpression {

    override def prettyName: String = "graft_char_bigram_counts"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      MinHashKernel.charBigramCounts(t.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.MinHashKernel.charBigramCounts($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def charBigramCounts(text: Column): Column =
    GraftBridge.column(CharBigramCounts(GraftBridge.expression(text)))

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $e")
  }

  private def boolArg(e: Expression, fn: String, pos: Int): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, BooleanType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a boolean literal, got $e")
  }

  private def arity(args: Seq[Expression], signature: String, ns: Int*): Unit =
    if (!ns.contains(args.length)) throw new IllegalArgumentException(
      s"expected $signature, got ${args.length} argument(s)")

  /** SQL registrations, mirroring the reference's extension-function
    * registry (function/jn/JNFun.java): `graft_minhash_sigs(text, k, n)`,
    * `graft_simhash32(text)`, `graft_winnowing(text, k, w)`,
    * `graft_word_gram_hashes(text, n[, dedup])`,
    * `graft_repetition_stats(text)`, `graft_word_counts(text)`,
    * `graft_char_bigram_counts(text)`. */
  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sigs" -> { args =>
      arity(args, "graft_minhash_sigs(text, k, n)", 3)
      MinHashSigs(args(0), intArg(args(1), "graft_minhash_sigs", 2),
        intArg(args(2), "graft_minhash_sigs", 3)) },
    "graft_simhash32" -> { args =>
      arity(args, "graft_simhash32(text)", 1)
      SimHash32Expr(args(0)) },
    "graft_winnowing" -> { args =>
      arity(args, "graft_winnowing(text, k, w)", 3)
      WinnowingPrints(args(0), intArg(args(1), "graft_winnowing", 2),
        intArg(args(2), "graft_winnowing", 3)) },
    "graft_word_gram_hashes" -> { args =>
      arity(args, "graft_word_gram_hashes(text, n[, dedup])", 2, 3)
      WordGramHashes(args(0), intArg(args(1), "graft_word_gram_hashes", 2),
        if (args.length > 2) boolArg(args(2), "graft_word_gram_hashes", 3) else false) },
    "graft_repetition_stats" -> { args =>
      arity(args, "graft_repetition_stats(text)", 1)
      RepetitionStats(args(0)) },
    "graft_word_counts" -> { args =>
      arity(args, "graft_word_counts(text)", 1)
      WordCounts(args(0)) },
    "graft_char_bigram_counts" -> { args =>
      arity(args, "graft_char_bigram_counts(text)", 1)
      CharBigramCounts(args(0)) })

  /** Runtime registration on an existing session (the
    * [[graft.functions.GraftExtensions]] hook injects the same set). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.MinHashExpressions", name),
        builder)
    }
}

/** Static kernel called from generated code (Scala object = static
  * forwarders, so codegen'd Java reaches it directly). */
object MinHashKernel {

  private val HEX: Array[Byte] = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Byte offset of each SQL character (code point), walked with
    * `UTF8String.numBytesForFirstByte` — the exact stepping
    * `substringSQL`/`numChars` use, so char-window slicing over the RAW
    * bytes reproduces `substring(text, i, k)` byte-for-byte, including on
    * malformed INTERIOR bytes (no String round-trip, which would
    * substitute U+FFFD). One deliberate divergence: a text ENDING in a
    * truncated multi-byte sequence makes Spark's own substring read past
    * the string's buffer (it slices to the stepped-past-end offset —
    * whatever bytes happen to live there); we clamp the final offset to
    * the string length instead of reproducing an out-of-bounds read. */
  private[functions] def charStarts(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      offs(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(n) = bytes.length
    java.util.Arrays.copyOf(offs, n + 1)
  }

  /** Word byte ranges of a space(0x20)-split text — byte-level split is
    * exact for UTF-8 (0x20 never occurs inside a multi-byte sequence).
    * Returns (starts, ends) as parallel arrays. */
  private def splitWords(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var start = 0
    var p = 0
    val len = bytes.length
    while (p <= len) {
      if (p == len || bytes(p) == 0x20) {
        if (p > start) { starts.add(start); ends.add(p) }
        start = p + 1
      }
      p += 1
    }
    val s = new Array[Int](starts.size())
    val e = new Array[Int](ends.size())
    var i = 0
    while (i < s.length) { s(i) = starts.get(i); e(i) = ends.get(i); i += 1 }
    (s, e)
  }

  /** Write the digest as lowercase hex into `hex` (32 bytes). */
  private def hexEncode(digest: Array[Byte], hex: Array[Byte]): Unit = {
    var j = 0
    while (j < 16) {
      hex(2 * j) = HEX((digest(j) >> 4) & 0xf)
      hex(2 * j + 1) = HEX(digest(j) & 0xf)
      j += 1
    }
  }

  /** Rotated-in-place comparison: digest hex rotated left by `off` chars vs
    * the stored (already-rotated) current min. */
  private def rotatedLess(hex: Array[Byte], off: Int, cur: Array[Byte]): Boolean = {
    var j = 0
    while (j < 32) {
      val a = hex(if (off + j < 32) off + j else off + j - 32)
      val b = cur(j)
      if (a != b) return a < b
      j += 1
    }
    false
  }

  def sigs(text: UTF8String, k: Int, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    val offs = charStarts(bytes)
    val m = (offs.length - 1) - k + 1
    if (m <= 0) return null
    val md = mdLocal.get()
    val mins = new Array[Array[Byte]](n)
    val hex = new Array[Byte](32)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      hexEncode(md.digest(), hex)
      var r = 0
      while (r < n) {
        val off = 4 * r
        if (mins(r) == null || rotatedLess(hex, off, mins(r))) {
          val out = if (mins(r) == null) new Array[Byte](32) else mins(r)
          System.arraycopy(hex, off, out, 0, 32 - off)
          System.arraycopy(hex, 0, out, 32 - off, off)
          mins(r) = out
        }
        r += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(b => UTF8String.fromBytes(b): AnyRef))
  }

  /** One-pass winnowing: md5 hex of every k-gram, forward-window min of
    * `w` consecutive hashes (tail windows truncate, matching
    * `rowsBetween(0, w-1)`), distinct prints in first-selection order.
    * Window minima come from a monotonic deque over a (w+1)-slot ring of
    * digests — O(m) compares total and O(w) live digest state, so a
    * pathologically large document costs 32·(w+1) bytes of hash memory,
    * never 32·|doc| (an earlier formulation materialized every k-gram
    * digest with no spill path). Each digest is computed exactly once,
    * when its index enters the lookahead window. */
  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val offs = charStarts(bytes)
    val m = (offs.length - 1) - k + 1
    if (m <= 0) return null
    val md = mdLocal.get()
    def less(a: Array[Byte], b: Array[Byte]): Boolean = {
      var j = 0
      while (j < 32) {
        if (a(j) != b(j)) return a(j) < b(j)
        j += 1
      }
      false
    }
    // live indices span at most w+1 slots; idx's slot only ever overwrites
    // that of the (long-dead) idx-w-1
    val cap = w + 1
    val ring = new Array[Array[Byte]](cap)
    val dq = new Array[Int](cap) // index deque, values increasing front→back
    var dqHead = 0 // slot of the front
    var dqLen = 0
    def admit(idx: Int): Unit = {
      md.reset()
      md.update(bytes, offs(idx), offs(idx + k) - offs(idx))
      val hex = new Array[Byte](32)
      hexEncode(md.digest(), hex)
      // pop strictly-greater backs; equal digests are one value, so tie
      // order cannot change the emitted minima
      while (dqLen > 0 && less(hex, ring(dq((dqHead + dqLen - 1) % cap) % cap)))
        dqLen -= 1
      ring(idx % cap) = hex
      dq((dqHead + dqLen) % cap) = idx
      dqLen += 1
    }
    var j = 0
    val primed = math.min(w, m)
    while (j < primed) { admit(j); j += 1 }
    val out = new java.util.LinkedHashSet[UTF8String]()
    var p = 0
    while (p < m) {
      // at most one front index (p-1) falls out of window [p, p+w)
      if (dq(dqHead) < p) { dqHead = (dqHead + 1) % cap; dqLen -= 1 }
      out.add(UTF8String.fromBytes(ring(dq(dqHead) % cap)))
      if (p + w < m) admit(p + w)
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Shared count-accumulation for the histogram kernels (insertion order
    * preserved). */
  private def countInto(counts: java.util.LinkedHashMap[UTF8String, Array[Long]],
                        key: UTF8String): Unit = {
    val cell = counts.get(key)
    if (cell == null) counts.put(key, Array(1L)) else cell(0) += 1
  }

  /** (key, cnt) struct rows from an accumulated histogram. */
  private def histToArray(
      counts: java.util.LinkedHashMap[UTF8String, Array[Long]]): GenericArrayData = {
    val out = new Array[AnyRef](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-doc char-bigram histogram in first-occurrence order; null when
    * the text has fewer than two characters. */
  def charBigramCounts(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val offs = charStarts(bytes)
    val m = (offs.length - 1) - 1
    if (m <= 0) return null
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < m) {
      countInto(counts, UTF8String.fromBytes(bytes, offs(i), offs(i + 2) - offs(i)))
      i += 1
    }
    histToArray(counts)
  }

  /** Per-doc word histogram in first-occurrence order; null when no word. */
  def wordCounts(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = splitWords(bytes)
    val nWords = starts.length
    if (nWords == 0) return null
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nWords) {
      countInto(counts, UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i)))
      i += 1
    }
    histToArray(counts)
  }

  /** One-pass per-doc repetition stats over space-split words (byte-level
    * split on 0x20, exact for UTF-8). Returns null when no word. */
  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val (starts, ends) = splitWords(bytes)
    val nWords = starts.length
    if (nWords == 0) return null
    // LinkedHashMap for uniformity with the histogram kernels; the
    // top-word selection is order-independent (compareTo tie-break)
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nWords) {
      countInto(counts, UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i)))
      i += 1
    }
    var topWord: UTF8String = null
    var topCnt = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > topCnt || (c == topCnt && e.getKey.compareTo(topWord) < 0)) {
        topWord = e.getKey; topCnt = c
      }
    }
    val grams = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < nWords - 1) {
      val l1 = ends(i) - starts(i)
      val l2 = ends(i + 1) - starts(i + 1)
      val g = new Array[Byte](l1 + 1 + l2)
      System.arraycopy(bytes, starts(i), g, 0, l1)
      g(l1) = 0x20
      System.arraycopy(bytes, starts(i + 1), g, l1 + 1, l2)
      grams.add(UTF8String.fromBytes(g))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords.toLong, topWord, topCnt, grams.size().toLong))
  }

  /** One-pass word-n-gram md5 hex array (position order, or per-doc
    * first-occurrence distinct). Null when fewer than n words. */
  def wordGramHashes(text: UTF8String, n: Int, dedup: Boolean): GenericArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = splitWords(bytes)
    val m = starts.length - n + 1
    if (m <= 0) return null
    val md = mdLocal.get()
    val out = new java.util.ArrayList[AnyRef](if (dedup) math.min(m, 16) else m)
    val seen = if (dedup) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(0x20.toByte)
        md.update(bytes, starts(i + j), ends(i + j) - starts(i + j))
        j += 1
      }
      val hex = new Array[Byte](32)
      hexEncode(md.digest(), hex)
      val s = UTF8String.fromBytes(hex)
      if (seen == null || seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One-pass 32-bit SimHash: split the raw UTF-8 bytes on 0x20 (a space
    * byte never occurs inside a multi-byte UTF-8 sequence, so byte-level
    * splitting equals the SQL `split(text, ' ')`), md5 each non-empty
    * token, vote bit `i` = nibble `i/4` bit `i%4` of the digest hex.
    * Returns null for a tokenless text (the exploded formulation produces
    * no row for it). */
  def simhash32(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    val (starts, ends) = splitWords(bytes)
    if (starts.length == 0) return null
    val md = mdLocal.get()
    val votes = new Array[Int](32)
    var t = 0
    while (t < starts.length) {
      md.reset()
      md.update(bytes, starts(t), ends(t) - starts(t))
      val digest = md.digest()
      var i = 0
      while (i < 32) {
        val hexPos = i >> 2
        val b = digest(hexPos >> 1)
        val nibble = if ((hexPos & 1) == 0) (b >> 4) & 0xf else b & 0xf
        votes(i) += (((nibble >> (i & 3)) & 1) << 1) - 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 32) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
