package graft.query

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed arm of the textual index scans: one member row of a
  * shredded array in, that member's scan hits out (exactly the hits the
  * full-document walk computes inside the member's subtree — same
  * walker, seeded with the chain's class prefix and the member's
  * printed position). Evaluated per member row across executors, so a
  * multi-GB document's scan never materializes on the driver — the
  * Spark answer to the reference's index iterators
  * (function/jn/index/scan/ScanPathIndex.java:35).
  *
  * `left` = the member's encoded JSON text, `right` = its ordinal. */
final case class JsonMemberScan(left: Expression, right: Expression,
                                kind: JsonPath.ScanKind,
                                chain: List[String])
    extends BinaryExpression with CodegenFallback {

  private val hitType = StructType(Seq(
    StructField("j", StringType), StructField("p", StringType),
    StructField("pp", StringType)))
  override def dataType: DataType = ArrayType(hitType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "json_member_scan"

  @transient private lazy val scanner =
    new JsonPath.MemberScanner(kind, chain)

  override def eval(input: InternalRow): Any = {
    val j = left.eval(input)
    val ix = right.eval(input)
    if (j == null || ix == null) return new GenericArrayData(Array.empty[Any])
    val hits = scanner.scan(j.asInstanceOf[UTF8String].toString,
      ix.asInstanceOf[Long])
    new GenericArrayData(hits.map { h =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(h.json), UTF8String.fromString(h.path),
        UTF8String.fromString(h.parentPath))
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonMemberScan =
    copy(left = newLeft, right = newRight)
}
