package graft.query

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
    StructField("pp", StringType), StructField("ip", StringType)))
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
        UTF8String.fromString(h.parentPath),
        UTF8String.fromString(h.idPath))
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonMemberScan =
    copy(left = newLeft, right = newRight)
}

/** Child/descendant counts of one item under the fused record model
  * (reference sdb/trx/GetChildCount.java, GetDescendantCount.java —
  * a fused object field is ONE node; GetDescendantCountTest pins
  * `{"a":{"b":1}}` at 2 descendants). Executor-side Jackson streaming
  * walk ([[NodeKeys.treeCounts]]) — O(bytes) per item, no driver
  * materialization. Returns `struct(child, desc)`. */
final case class JsonTreeCounts(child: Expression,
                                jsonOnly: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("child", LongType), StructField("desc", LongType)))
  override def prettyName: String = "json_tree_counts"

  override protected def nullSafeEval(json: Any): Any = {
    val (c, d) = NodeKeys.treeCounts(
      json.asInstanceOf[UTF8String].toString, jsonOnly)
    InternalRow(c, d)
  }

  override protected def withNewChildInternal(
      newChild: Expression): JsonTreeCounts = copy(child = newChild)
}

/** Breadth-first traversal of one item's subtree, the VALUE of each
  * visited node in visit order (reference sdb/trx/LevelOrder.java over
  * axis/LevelOrderAxis.java — includeSelf NO, `filterLevel` = max
  * level; under the fused model each object field is one node whose
  * item-factory view is its value, each array member is its own node).
  * Evaluated where the item row lives, so a stored document's
  * traversal never collects to the driver.
  *
  * The output is BUDGETED: every visited node re-serializes its whole
  * subtree, so total bytes are O(doc bytes x average depth) — an
  * unbounded traversal of a near-cap stored document would build a
  * multi-GB single array value and die on executor OOM or the 2 GB
  * buffer limit instead of an explainable error. Past `maxBytes`
  * (default 256 MB) the traversal fails LOUDLY with the knob named. */
final case class JsonLevelOrder(child: Expression, maxLevel: Int,
                                maxBytes: Long = JsonLevelOrder.DefaultMaxBytes)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "json_level_order"

  override protected def nullSafeEval(json: Any): Any = {
    val mapper = JsonLevelOrder.mapper
    val root = mapper.readTree(json.asInstanceOf[UTF8String].toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var bytes = 0L
    // queue holds VALUE nodes (fused field -> its value; array member
    // -> itself) with their level; root's children are level 1
    val q = new java.util.ArrayDeque[(com.fasterxml.jackson.databind.JsonNode, Int)]()
    def enqueueChildren(n: com.fasterxml.jackson.databind.JsonNode,
                        level: Int): Unit =
      if (level <= maxLevel) {
        if (n.isObject) {
          val it = n.elements(); while (it.hasNext) q.add((it.next(), level))
        } else if (n.isArray) {
          val it = n.elements(); while (it.hasNext) q.add((it.next(), level))
        }
      }
    enqueueChildren(root, 1)
    while (!q.isEmpty) {
      val (n, level) = q.poll()
      val s = UTF8String.fromString(mapper.writeValueAsString(n))
      bytes += s.numBytes()
      if (bytes > maxBytes) throw new UnsupportedOperationException(
        s"sdb:level-order: serialized traversal exceeds $maxBytes " +
          "bytes (every visited node re-serializes its subtree — " +
          "pass a depth limit, or raise " +
          "spark.graft.levelOrder.maxBytes)")
      out += s
      enqueueChildren(n, level + 1)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): JsonLevelOrder = copy(child = newChild)
}

private object JsonLevelOrder {
  val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  val DefaultMaxBytes: Long = 256L << 20
}

/** Shallow object entries in the INPUT TEXT's order: the member KEYS
  * (`values = false`) or member value JSONs (`values = true`) of one
  * JSON object text — jn:keys / jn:values. The reference's brackit
  * JSONFun iterates insertion order, and so does this expression —
  * the caller's job is to feed it the items' ORIGINAL text
  * (JsoniqRun.rawEntrySeq: member_raw / stored doc text / skeleton
  * sidecar) rather than the variant serialization, which key-sorts at
  * parse (that canonical order remains the documented fallback for
  * items with no source text). Guarantees key↔value pairing and
  * streams one object per call. Non-objects yield the empty array. */
final case class JsonObjectShallow(child: Expression, values: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (values) "json_object_values" else "json_object_keys_ordered"

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def eval(input: InternalRow): Any = {
    val j = child.eval(input)
    if (j == null) return new GenericArrayData(Array.empty[Any])
    val node = mapper.readTree(j.asInstanceOf[UTF8String].toString)
    if (node == null || !node.isObject)
      return new GenericArrayData(Array.empty[Any])
    val out = Array.newBuilder[Any]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      out += UTF8String.fromString(
        if (values) e.getValue.toString else e.getKey)
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(
      newChild: Expression): JsonObjectShallow = copy(child = newChild)
}

/** Distributed arm of the textual XML index scans ([[XmlScan]]): one
  * shredded element-chain member in (its [[XmlItem]] JSON), that
  * member's scan hits out — evaluated per member row across executors,
  * so a multi-GB stored XML document's CAS/path scan never
  * materializes on the driver (reference function/xml/index/scan/
  * ScanCASIndex.java streams its red-black-tree index the same way).
  * Only called for patterns PROVABLY local to the entry's members
  * ([[XmlScan.memberLocal]]); text-node members scan to nothing. */
final case class XmlMemberXScan(child: Expression,
                                basePath: List[String],
                                patterns: Seq[XmlScan.Pattern],
                                mode: XmlScan.Mode)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "xml_member_scan"

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def eval(input: InternalRow): Any = {
    val j = child.eval(input)
    if (j == null) return new GenericArrayData(Array.empty[Any])
    val node = mapper.readTree(j.asInstanceOf[UTF8String].toString)
    if (!node.isObject || !node.has("~n"))
      return new GenericArrayData(Array.empty[Any])
    val hits = XmlScan.walk(node,
      basePath :+ node.get("~n").asText(), Some(patterns), mode)
    new GenericArrayData(
      hits.map(UTF8String.fromString(_): Any).toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): XmlMemberXScan = copy(child = newChild)
}

/** Preorder offset of a printed path inside ONE shredded member's
  * subtree (fused model; 0 = the member itself, null when the path
  * does not exist) — the executor-side arm of distributed node-key
  * resolution over member tables ([[NodeKeys.relativeOffset]]).
  * `left` = the member's JSON text, `right` = the path WITHIN the
  * member (the scan hit's identity path minus the `/chain/[idx]`
  * prefix; "" = the member itself). */
final case class JsonRelativeKey(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_relative_key"

  override protected def nullSafeEval(json: Any, path: Any): Any =
    NodeKeys.relativeOffset(
      json.asInstanceOf[UTF8String].toString,
      NodeKeys.parsePath(path.asInstanceOf[UTF8String].toString))
      .map(Long.box).orNull

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonRelativeKey =
    copy(left = newLeft, right = newRight)
}
