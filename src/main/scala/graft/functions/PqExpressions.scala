package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (the byte-budget ANN layout for 100 TB
  * embedding stores: M sub-space centroid ids per vector — 8-16 bytes —
  * instead of 4·dim float bytes; asymmetric-distance search never
  * reconstructs a vector).
  *
  * Both kernels are codegen'd Catalyst expressions whose constant data
  * (codebooks / the query's distance table) rides into the generated class
  * as a flat `double[]` reference object — a tight primitive loop with
  * direct array indexing, no per-row boxing, JIT-vectorizable, exactly the
  * shape the reference hand-writes with the Vector API for its HNSW
  * distance kernels (bundles/sirix-core/src/main/java/io/sirix/index/
  * vector/ops/SimdL2Distance.java).
  *
  * The fit lives in [[graft.operators.Pq]]; these expressions are the
  * per-row hot path (encode once at write, table-lookup per candidate at
  * search).
  */
object PqExpressions {

  /** argmin-encode: vector → M int32 centroid ids (one per sub-space).
    * `codebook(m)(c)` is sub-space m's centroid c (subDim doubles). Input
    * vectors whose length ≠ M·subDim yield NULL (a corrupt embedding must
    * not silently encode as a truncated code). Ties break to the lowest
    * centroid id (strict `<`), matching [[graft.operators.IvfIndex
    * .assignCells]]'s first-minimal contract. A vector with NULL elements
    * also yields NULL — `ArrayData.getFloat` on a null slot returns an
    * undefined value, which would otherwise encode to plausible-looking
    * but wrong codes (same contract as the length mismatch).
    *
    * `normalize = true` (the cosine contract) quantizes the UNIT vector
    * x/‖x‖: with raw vectors, every row sharing a code cell has the same
    * ADC numerator and cosine ranking inside a cell degenerates to
    * 1/‖x‖ — small-norm rows beat the true neighbours. On unit vectors
    * the ADC sum approximates the cosine itself. A zero vector encodes
    * unnormalized (its cosine is undefined; callers filter on the stored
    * norm). */
  case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]],
                      normalize: Boolean = true)
      extends UnaryExpression {

    private val m = codebook.length
    private val k = codebook.head.length
    private val subDim = codebook.head.head.length
    require(m > 0 && k > 0 && subDim > 0 &&
      codebook.forall(s => s.length == k && s.forall(_.length == subDim)),
      "PqEncode: ragged codebook")

    /** Flat [m][k][subDim] row-major — the codegen reference object. */
    @transient private lazy val flat: Array[Double] =
      codebook.flatten.flatten.toArray

    override def prettyName: String = "graft_pq_encode"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    // nullable regardless of the child: a NON-null vector still encodes
    // to NULL on length mismatch or null slots. Without this override a
    // non-nullable input makes codegen assign into the `false` literal
    // ("false = true;" — not an rvalue) and the whole UnsafeProjection
    // silently degrades to interpreted eval.
    override def nullable: Boolean = true

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<float|double>, got ${other.sql}")
      }

    private def containsNull: Boolean =
      child.dataType.asInstanceOf[ArrayType].containsNull

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      if (xs.numElements() != m * subDim) return null
      if (containsNull) {
        var i = 0
        while (i < m * subDim) {
          if (xs.isNullAt(i)) return null
          i += 1
        }
      }
      val f = isFloat
      def raw(i: Int): Double =
        if (f) xs.getFloat(i).toDouble else xs.getDouble(i)
      val inv =
        if (!normalize) 1.0
        else {
          var s = 0.0
          var i = 0
          while (i < m * subDim) { val x = raw(i); s += x * x; i += 1 }
          if (s > 0) 1.0 / math.sqrt(s) else 1.0
        }
      val codes = new Array[Int](m)
      var mi = 0
      while (mi < m) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          val base = (mi * k + c) * subDim
          while (j < subDim) {
            val t = raw(mi * subDim + j) * inv - flat(base + j)
            d += t * t
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(mi) = best
        mi += 1
      }
      new GenericArrayData(codes)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val get = if (isFloat) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, a => {
        // freshName every local: two instances may inline into one scope
        val codes = ctx.freshName("codes")
        val mi = ctx.freshName("mi")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val t = ctx.freshName("t")
        val s2 = ctx.freshName("s2")
        val x = ctx.freshName("x")
        val inv = ctx.freshName("inv")
        val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        val base = ctx.freshName("base")
        val normCode =
          if (!normalize) s"double $inv = 1.0;"
          else s"""
             |double $s2 = 0.0;
             |for (int $i = 0; $i < ${m * subDim}; $i++) {
             |  double $x = (double) $a.$get($i);
             |  $s2 += $x * $x;
             |}
             |double $inv = $s2 > 0 ? 1.0 / java.lang.Math.sqrt($s2) : 1.0;
           """.stripMargin
        val nn = ctx.freshName("nn")
        // null-slot scan only runs once the length matched (isNullAt past
        // numElements is undefined); skipped entirely for containsNull=false
        val nullScan =
          if (!containsNull) s"boolean $nn = false;"
          else s"""
             |boolean $nn = false;
             |for (int $i = 0; $i < ${m * subDim} && !$nn; $i++) {
             |  if ($a.isNullAt($i)) $nn = true;
             |}
           """.stripMargin
        s"""
           |if ($a.numElements() != ${m * subDim}) {
           |  ${ev.isNull} = true;
           |} else {
           |  $nullScan
           |  if ($nn) {
           |    ${ev.isNull} = true;
           |  } else {
           |    $normCode
           |    int[] $codes = new int[$m];
           |    for (int $mi = 0; $mi < $m; $mi++) {
           |      int $best = 0;
           |      double $bestD = Double.MAX_VALUE;
           |      for (int $c = 0; $c < $k; $c++) {
           |        double $d = 0.0;
           |        int $base = ($mi * $k + $c) * $subDim;
           |        for (int $j = 0; $j < $subDim; $j++) {
           |          double $t = (double) $a.$get($mi * $subDim + $j) * $inv - $cb[$base + $j];
           |          $d += $t * $t;
           |        }
           |        if ($d < $bestD) { $bestD = $d; $best = $c; }
           |      }
           |      $codes[$mi] = $best;
           |    }
           |    ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($codes);
           |  }
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Asymmetric-distance lookup: codes → Σₘ table(m)(code(m)). The table
    * is query-specific (built driver-side by [[graft.operators.Pq
    * .distTable]]) and can hold squared-L2 (distance) or inner-product
    * (similarity) partials — the expression just sums the lookups. NULL
    * for null codes, a null code SLOT, wrong arity, or an out-of-range
    * code (hostile storage must not read out of the table). */
  case class PqAdc(child: Expression, table: Seq[Seq[Double]])
      extends UnaryExpression {

    private val m = table.length
    private val k = table.head.length
    require(m > 0 && k > 0 && table.forall(_.length == k), "PqAdc: ragged table")

    @transient private lazy val flat: Array[Double] = table.flatten.toArray

    override def prettyName: String = "graft_pq_adc"
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true // wrong arity/out-of-range/null slot → NULL

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(IntegerType | ShortType | ByteType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<int|short|byte> codes, got ${other.sql}")
      }

    private def getCode(xs: ArrayData, i: Int): Int =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case IntegerType => xs.getInt(i)
        case ShortType => xs.getShort(i).toInt
        case ByteType => xs.getByte(i).toInt
      }

    private def containsNull: Boolean =
      child.dataType.asInstanceOf[ArrayType].containsNull

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      if (xs.numElements() != m) return null
      var acc = 0.0
      var i = 0
      while (i < m) {
        if (containsNull && xs.isNullAt(i)) return null
        val c = getCode(xs, i)
        if (c < 0 || c >= k) return null
        acc += flat(i * k + c)
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tb = ctx.addReferenceObj("pqTable", flat, "double[]")
      val get = child.dataType.asInstanceOf[ArrayType].elementType match {
        case IntegerType => "getInt"
        case ShortType => "getShort"
        case ByteType => "getByte"
      }
      nullSafeCodeGen(ctx, ev, a => {
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        val bad = ctx.freshName("bad")
        s"""
           |if ($a.numElements() != $m) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $m; $i++) {
           |    ${if (containsNull) s"if ($a.isNullAt($i)) { $bad = true; break; }" else ""}
           |    int $c = (int) $a.$get($i);
           |    if ($c < 0 || $c >= $k) { $bad = true; break; }
           |    $acc += $tb[$i * $k + $c];
           |  }
           |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry points. */
  def pqEncode(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebook))

  def pqAdc(codes: Column, table: Seq[Seq[Double]]): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(codes), table))
}
