package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst vector kernels (SURVEY.md §4.3 item 3).
  *
  * The reference ships SIMD distance kernels for its vector index
  * (bundles/sirix-core/src/main/java/io/sirix/index/vector/ops/
  * SimdCosineDistance.java). The Spark analog is a codegen'd Catalyst
  * expression: `doGenCode` emits a tight primitive loop over the two array
  * buffers inside whole-stage codegen — no boxing, no lambda dispatch, and
  * the JIT auto-vectorizes it. Results are bit-identical to the
  * `zip_with`+`aggregate` double fold in [[graft.operators.Similarity]]
  * (same sequential accumulation order), so either path satisfies the same
  * differential oracle.
  */
object VectorExpressions {

  /** cosine(a, b) over array<float|double> in double precision. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def prettyName: String = "graft_cosine"
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), ys.numElements())
      val lf = elemType(left) == FloatType
      val rf = elemType(right) == FloatType
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
        val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // every local via freshName: two instances of this expression can
        // land in ONE generated method scope (UnsafeProjection inlines
        // them flat), where a hardcoded `i`/`n` is a janino
        // "Redefinition of local variable" → silent interpreter fallback
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val lGet = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val rGet = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $lGet;
           |  double $y = $rGet;
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** dot(a, b) in double precision (same codegen shape). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def prettyName: String = "graft_dot"
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), ys.numElements())
      val lf = elemType(left) == FloatType
      val rf = elemType(right) == FloatType
      var dot = 0.0; var i = 0
      while (i < n) {
        val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
        val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
        dot += x * y; i += 1
      }
      dot
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // freshName for every local — see CosineSimilarity.doGenCode
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val lGet = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val rGet = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $dot += ($lGet) * ($rGet); }
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column-API entry points (no registration needed). */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  private val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { args => CosineSimilarity(args(0), args(1)) },
    "graft_dot" -> { args => DotProduct(args(0), args(1)) })

  /** Runtime registration: makes `graft_cosine` / `graft_dot` callable from
    * SQL and `expr(...)` on an existing session. */
  def install(spark: SparkSession): Unit = registrations.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.VectorExpressions", name),
      builder)
  }
}

/** `SparkSessionExtensions` hook: enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (SURVEY.md §4.3). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo("graft.functions.VectorExpressions", "graft_cosine"),
      (args: Seq[Expression]) => VectorExpressions.CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo("graft.functions.VectorExpressions", "graft_dot"),
      (args: Seq[Expression]) => VectorExpressions.DotProduct(args(0), args(1))))
    MinHashExpressions.registrations.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.MinHashExpressions", name),
        builder))
    }
    CdcExpressions.registrations.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.CdcExpressions", name),
        builder))
    }
    ext.injectOptimizerRule(graft.plans.CountFromMetadataRule(_))
    ext.injectOptimizerRule(graft.plans.ValidTimeStabRule(_))
    ext.injectOptimizerRule(graft.plans.DictAggRule(_))
    ext.injectOptimizerRule(graft.plans.MinMaxFromMetadataRule(_))
    ext.injectResolutionRule(graft.plans.DeltaReconstructRule(_))
  }
}
