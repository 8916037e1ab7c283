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
}

/** Static kernel called from generated code (Scala object = static
  * forwarders, so codegen'd Java reaches it directly). */
object MinHashKernel {

  private val HEX: Array[Byte] = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

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
    // code points, matching SQL substring/length semantics exactly
    val cps = text.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return null
    val md = mdLocal.get()
    val mins = new Array[Array[Byte]](n)
    val hex = new Array[Byte](32)
    var i = 0
    while (i < m) {
      val digest = {
        md.reset()
        md.digest(new String(cps, i, k).getBytes(StandardCharsets.UTF_8))
      }
      var j = 0
      while (j < 16) {
        hex(2 * j) = HEX((digest(j) >> 4) & 0xf)
        hex(2 * j + 1) = HEX(digest(j) & 0xf)
        j += 1
      }
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
}
