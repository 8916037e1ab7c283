package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Custom aggregate surface (SURVEY.md §2.13).
  *
  * The reference folds aggregates in exact BigDecimal arithmetic inside its
  * vectorized executor (bundles/sirix-query/src/main/java/io/sirix/query/
  * scan/SirixVectorizedExecutor.java imports java.math.BigDecimal/
  * RoundingMode at :97-99). `ExactDecimalSum` is the Spark analog as a
  * `TypedImperativeAggregate`: each double input is converted to its 2dp
  * decimal (Spark's own double→DECIMAL(18,2) cast semantics) and folded in
  * unbounded BigDecimal — partial buffers merge associatively, so the
  * partial→final HashAggregate shape (and therefore cluster scale-out)
  * works unchanged.
  */
case class ExactDecimalSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBigDecimal] with UnaryLike[Expression] {

  override def prettyName: String = "graft_decsum"
  override def dataType: DataType = DecimalType(38, 2)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): JBigDecimal = JBigDecimal.ZERO

  override def update(buffer: JBigDecimal, input: InternalRow): JBigDecimal = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.add(JBigDecimal.valueOf(v.asInstanceOf[Double])
      .setScale(2, RoundingMode.HALF_UP))
  }

  override def merge(b1: JBigDecimal, b2: JBigDecimal): JBigDecimal = b1.add(b2)

  override def eval(buffer: JBigDecimal): Any =
    Decimal(buffer.setScale(2, RoundingMode.HALF_UP))

  override def serialize(buffer: JBigDecimal): Array[Byte] =
    buffer.toString.getBytes("UTF-8")

  override def deserialize(bytes: Array[Byte]): JBigDecimal =
    new JBigDecimal(new String(bytes, "UTF-8"))

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactDecimalSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ExactDecimalSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): ExactDecimalSum =
    copy(child = newChild)
}

object AggregateExpressions {
  /** Exact-decimal sum of a double column as a Column aggregate. */
  def exactDecimalSum(c: Column): Column =
    GraftBridge.column(
      ExactDecimalSum(GraftBridge.expression(c)).toAggregateExpression())
}
