package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Fused XML-path text extraction over the [[graft.query.XmlItem]]
  * variant encoding: `input/name1/name2/.../text()` evaluated as ONE
  * native walk over the variant binary.
  *
  * The compositional compile (`flatten(transform(filter(...)))` per
  * step) is semantically identical but runs interpreted — Spark's
  * higher-order functions are CodegenFallback — at ~50 expression-node
  * dispatches per step per row, which made XMark q10's 15-field element
  * constructor the dominant cost of the whole suite. This expression is
  * also CodegenFallback, but its eval is a single tight loop over the
  * variant buffer: child elements are matched by `~n` name per level,
  * then the matched elements' STRING children (text nodes) concatenate
  * with the single-space atomic-adjacency rule of the content
  * serializer (JsoniqRun.textOfSeq). Missing paths yield "" — the
  * serializer's empty-content form.
  *
  * Reference navigation semantics: child axis over the element tree,
  * bundles/sirix-core/src/main/java/io/sirix/axis/ChildAxis.java. */
final case class XmlChildTexts(child: Expression, names: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "xml_child_texts"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return UTF8String.EMPTY_UTF8
    val vv = v.asInstanceOf[VariantVal]
    var cur: java.util.ArrayList[Variant] = new java.util.ArrayList[Variant]()
    cur.add(new Variant(vv.getValue, vv.getMetadata))
    names.foreach { nm =>
      val next = new java.util.ArrayList[Variant]()
      var i = 0
      while (i < cur.size()) {
        val kids = childrenOf(cur.get(i))
        if (kids != null) {
          var j = 0
          val n = kids.arraySize()
          while (j < n) {
            val e = kids.getElementAtIndex(j)
            if (e.getType == VariantUtil.Type.OBJECT) {
              val en = e.getFieldByKey("~n")
              if (en != null && en.getType == VariantUtil.Type.STRING &&
                  en.getString == nm) next.add(e)
            }
            j += 1
          }
        }
        i += 1
      }
      cur = next
    }
    val sb = new java.lang.StringBuilder()
    var first = true
    var i = 0
    while (i < cur.size()) {
      val kids = childrenOf(cur.get(i))
      if (kids != null) {
        var j = 0
        val n = kids.arraySize()
        while (j < n) {
          val e = kids.getElementAtIndex(j)
          if (e.getType == VariantUtil.Type.STRING) {
            // adjacent ATOMIC items take one separating space (the
            // content-serialization rule); text items are always atomic
            if (!first) sb.append(' ')
            sb.append(e.getString)
            first = false
          }
          j += 1
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** The element's `~c` children array, or null for non-elements. */
  private def childrenOf(v: Variant): Variant =
    if (v.getType != VariantUtil.Type.OBJECT) null
    else {
      val c = v.getFieldByKey("~c")
      if (c != null && c.getType == VariantUtil.Type.ARRAY) c else null
    }

  override protected def withNewChildInternal(
      newChild: Expression): XmlChildTexts = copy(child = newChild)
}
