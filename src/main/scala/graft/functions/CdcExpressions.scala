package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Gear/FastCDC-style rolling hash) — the
  * chunk-level dedup primitive: boundaries depend only on LOCAL content,
  * so editing a document shifts chunk offsets but re-synchronizes within
  * one chunk, and the untouched remainder keeps its chunk hashes — the
  * property fixed-window chunking lacks and the reason CDC is the
  * standard shared-boilerplate detector at corpus scale. No reference
  * analog (corpus operators are parity-plus).
  *
  * One pass per document, O(bytes): the Gear hash rolls per byte
  * (`h = (h << 1) + GEAR(b)`), a boundary cuts at a CHARACTER position
  * once the chunk has `minChars` code points and `h & mask == 0`
  * (mask = 2^avgBits − 1 → expected chunk length ≈ 2^avgBits chars over
  * random text), with a forced cut at `maxChars`. Boundaries are only
  * tested at UTF-8 character starts (the same `substringSQL` stepping as
  * the MinHash kernels), so every chunk is a well-formed substring:
  * `chunk i == substring(text, start+1, len)` and `hash ==
  * xxhash64(substring(...))` hold EXACTLY (seed-42 XXH64 over the same
  * bytes) — the differential the spec pins. One documented divergence,
  * shared with every kernel on MinHashKernel.charStarts: a text ENDING
  * in a truncated multi-byte sequence clamps its final character to the
  * buffer, where Spark's own substring reads past it — there the last
  * chunk's hash is over the clamped bytes, not substring's
  * out-of-bounds slice.
  */
object CdcExpressions {

  /** Deterministic 256-entry Gear table (splitmix64 over the index —
    * fixed forever; changing it would silently re-chunk every corpus). */
  private[functions] val GEAR: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** `graft_cdc_chunks(text)` → array<struct<start int, len int, hash
    * bigint>> — start/len in CHARACTERS (substring-compatible), hash =
    * seed-42 XXH64 of the chunk's UTF-8 bytes (= Spark's `xxhash64` of
    * the chunk string). Null for null/empty text. */
  case class CdcChunks(child: Expression, avgBits: Int, minChars: Int,
                       maxChars: Int) extends UnaryExpression {

    require(avgBits >= 1 && avgBits <= 30, s"avgBits out of range: $avgBits")
    require(minChars >= 1 && maxChars >= minChars,
      s"need 1 <= minChars <= maxChars, got $minChars..$maxChars")

    override def prettyName: String = "graft_cdc_chunks"
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

    override def nullSafeEval(t: Any): Any =
      CdcKernel.chunks(t.asInstanceOf[UTF8String], avgBits, minChars, maxChars)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.CdcKernel.chunks($c, $avgBits, $minChars, $maxChars);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def cdcChunks(text: Column, avgBits: Int = 6, minChars: Int = 16,
                maxChars: Int = 256): Column =
    GraftBridge.column(CdcChunks(GraftBridge.expression(text),
      avgBits, minChars, maxChars))

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  /** SQL registration (`graft_cdc_chunks(text[, avgBits, minChars,
    * maxChars])`), injected by [[GraftExtensions]] with the other
    * kernels. */
  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cdc_chunks" -> { args =>
      if (args.length != 1 && args.length != 4) throw new IllegalArgumentException(
        s"expected graft_cdc_chunks(text[, avgBits, minChars, maxChars]), " +
          s"got ${args.length} argument(s)")
      if (args.length == 1) CdcChunks(args(0), 6, 16, 256)
      else CdcChunks(args(0), intArg(args(1), "graft_cdc_chunks", 2),
        intArg(args(2), "graft_cdc_chunks", 3),
        intArg(args(3), "graft_cdc_chunks", 4))
    })
}

object CdcKernel {

  def chunks(text: UTF8String, avgBits: Int, minChars: Int,
             maxChars: Int): GenericArrayData = {
    val bytes = text.getBytes
    if (bytes.isEmpty) return null
    // the ONE charStarts (MinHashKernel's): chunk boundaries and shingle
    // boundaries must step text identically forever
    val offs = MinHashKernel.charStarts(bytes)
    val nChars = offs.length - 1
    val mask = (1L << avgBits) - 1L
    val gear = CdcExpressions.GEAR
    val out = new java.util.ArrayList[InternalRow]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < nChars) {
      var b = offs(i)
      val bEnd = offs(i + 1)
      while (b < bEnd) { h = (h << 1) + gear(bytes(b) & 0xff); b += 1 }
      val clen = i - start + 1
      if ((clen >= minChars && (h & mask) == 0L) || clen >= maxChars ||
          i == nChars - 1) {
        val from = offs(start)
        val until = offs(i + 1)
        val hash = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
        out.add(InternalRow(start, clen, hash))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size())))
  }
}
