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

/** String items of an XML path `input/name1/.../(@attr | text())` as
  * ONE native walk: the sequence form of [[XmlChildTexts]] — attribute
  * values (or text children) of the matched elements, in document
  * order. Feeds general-comparison `exists` chains without the ~50
  * interpreted HOF nodes the compositional compile pays per step. */
final case class XmlPathStrings(child: Expression, names: Seq[String],
                                attr: Option[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "xml_path_strings"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out = new java.util.ArrayList[UTF8String]()
    if (v != null) {
      val vv = v.asInstanceOf[VariantVal]
      var cur = new java.util.ArrayList[Variant]()
      cur.add(new Variant(vv.getValue, vv.getMetadata))
      names.foreach { nm =>
        val next = new java.util.ArrayList[Variant]()
        var i = 0
        while (i < cur.size()) {
          val e0 = cur.get(i)
          if (e0.getType == VariantUtil.Type.OBJECT) {
            val kids = e0.getFieldByKey("~c")
            if (kids != null && kids.getType == VariantUtil.Type.ARRAY) {
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
          }
          i += 1
        }
        cur = next
      }
      var i = 0
      while (i < cur.size()) {
        val e0 = cur.get(i)
        attr match {
          case Some(a) =>
            val as = e0.getFieldByKey("~a")
            if (as != null && as.getType == VariantUtil.Type.OBJECT) {
              val av = as.getFieldByKey(a)
              if (av != null && av.getType == VariantUtil.Type.STRING)
                out.add(UTF8String.fromString(av.getString))
            }
          case None =>
            val kids = e0.getFieldByKey("~c")
            if (kids != null && kids.getType == VariantUtil.Type.ARRAY) {
              var j = 0
              val n = kids.arraySize()
              while (j < n) {
                val k = kids.getElementAtIndex(j)
                if (k.getType == VariantUtil.Type.STRING)
                  out.add(UTF8String.fromString(k.getString))
                j += 1
              }
            }
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): XmlPathStrings = copy(child = newChild)
}

/** Re-serialize an [[graft.query.XmlItem]]-encoded element back to XML
  * text: one native recursive walk over the variant binary. Text nodes
  * escape the markup-significant characters exactly as the StAX parse
  * decoded them; empty elements self-close (the reference serializer's
  * form, results/q02.out). Non-element inputs (plain JSON items) yield
  * null so callers can fall back to JSON serialization. */
final case class XmlSerialize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "xml_serialize"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val vv = v.asInstanceOf[VariantVal]
    val root = new Variant(vv.getValue, vv.getMetadata)
    if (root.getType != VariantUtil.Type.OBJECT ||
      root.getFieldByKey("~n") == null) return null
    val sb = new java.lang.StringBuilder()
    // the DOCUMENT node ({"~n":""}) serializes its children unwrapped
    // (the reference serializes a document as its root element)
    if (root.getFieldByKey("~n").getString.isEmpty) {
      val kids = root.getFieldByKey("~c")
      if (kids != null && kids.getType == VariantUtil.Type.ARRAY) {
        var i = 0
        while (i < kids.arraySize()) {
          val k = kids.getElementAtIndex(i)
          if (k.getType == VariantUtil.Type.STRING) escText(k.getString, sb)
          else if (k.getType == VariantUtil.Type.OBJECT &&
            k.getFieldByKey("~n") != null) emit(k, sb)
          i += 1
        }
      }
    } else emit(root, sb)
    UTF8String.fromString(sb.toString)
  }

  private def escText(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  private def emit(e: Variant, sb: java.lang.StringBuilder): Unit = {
    val name = e.getFieldByKey("~n").getString
    sb.append('<').append(name)
    val attrs = e.getFieldByKey("~a")
    if (attrs != null && attrs.getType == VariantUtil.Type.OBJECT) {
      var i = 0
      val n = attrs.objectSize()
      while (i < n) {
        val f = attrs.getFieldAtIndex(i)
        sb.append(' ').append(f.key).append("=\"")
        val raw = f.value.getString
        var j = 0
        while (j < raw.length) {
          raw.charAt(j) match {
            case '&' => sb.append("&amp;")
            case '<' => sb.append("&lt;")
            case '"' => sb.append("&quot;")
            case c => sb.append(c)
          }
          j += 1
        }
        sb.append('"')
        i += 1
      }
    }
    val kids = e.getFieldByKey("~c")
    val size =
      if (kids != null && kids.getType == VariantUtil.Type.ARRAY)
        kids.arraySize()
      else 0
    if (size == 0) { sb.append("/>"); return }
    sb.append('>')
    var i = 0
    while (i < size) {
      val k = kids.getElementAtIndex(i)
      if (k.getType == VariantUtil.Type.STRING) escText(k.getString, sb)
      else if (k.getType == VariantUtil.Type.OBJECT &&
        k.getFieldByKey("~n") != null) emit(k, sb)
      i += 1
    }
    sb.append("</").append(name).append('>')
  }

  override protected def withNewChildInternal(
      newChild: Expression): XmlSerialize = copy(child = newChild)
}

/** The typed write-time projection of one XML member's ENCODED JSON
  * text: `struct(n, t)` where `n` is the element name and `t` holds
  * the requested attribute values (`@name` fields) and child elements'
  * name-addressed text (the [[XmlChildTexts]] concat rule: the
  * element's STRING children joined by one space, across same-named
  * children in document order), each converted to its sampled type
  * (`bigint` / `double` / `string`; unparseable or absent → null —
  * the try_cast discipline the query-side predicates assume).
  *
  * ONE Jackson streaming scan per row. A compositional compile
  * (parse_json per field under CollapseProject + a variant walk per
  * child name, each evaluated twice through its null-wrapper) measured
  * 2× the whole member write; this is the write-side analog of the
  * reference's PAX region builders (page/pax/StringRegion.java:76). */
final case class XmlMemberShape(child: Expression,
                                attrs: Seq[(String, String)],
                                childs: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

  private def dt(t: String): DataType = t match {
    case "bigint" => LongType
    case "double" => DoubleType
    case _ => StringType
  }
  private val tType = StructType(
    attrs.map { case (n, t) => StructField("@" + n, dt(t)) } ++
      childs.map { case (n, t) => StructField(n, dt(t)) })
  override def dataType: DataType = StructType(Seq(
    StructField("n", StringType), StructField("t", tType)))
  override def nullable: Boolean = false
  override def prettyName: String = "xml_member_shape"

  // field slot by name, computed once
  private val attrSlot: Map[String, Int] =
    attrs.map(_._1).zipWithIndex.toMap
  private val childSlot: Map[String, Int] =
    childs.map(_._1).zipWithIndex.map { case (n, i) =>
      n -> (i + attrs.size) }.toMap
  private val slotType: Array[String] =
    (attrs.map(_._2) ++ childs.map(_._2)).toArray

  override def eval(input: InternalRow): Any = {
    import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
    val v = child.eval(input)
    val out = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(2)
    val t = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(slotType.length)
    out.update(1, t)
    if (v == null) return out
    val texts = new Array[java.lang.StringBuilder](slotType.length)
    try {
      val p = new JsonFactory()
        .createParser(v.asInstanceOf[UTF8String].toString)
      if (p.nextToken() == JsonToken.START_OBJECT) {
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          p.currentName() match {
            case "~n" =>
              if (p.nextToken() == JsonToken.VALUE_STRING)
                out.update(0, UTF8String.fromString(p.getText))
            case "~a" =>
              if (p.nextToken() == JsonToken.START_OBJECT) {
                while (p.nextToken() == JsonToken.FIELD_NAME) {
                  val slot = attrSlot.getOrElse(p.currentName(), -1)
                  p.nextToken()
                  if (slot >= 0 && p.currentToken().isScalarValue)
                    setTyped(t, slot, p.getText)
                  else p.skipChildren()
                }
              }
            case "~c" =>
              if (p.nextToken() == JsonToken.START_ARRAY) {
                var tok = p.nextToken()
                while (tok != JsonToken.END_ARRAY && tok != null) {
                  if (tok == JsonToken.START_OBJECT) {
                    // one child element: find its ~n and its direct
                    // STRING children; skip everything nested
                    var slot = -1
                    val buf = new java.lang.StringBuilder()
                    while (p.nextToken() == JsonToken.FIELD_NAME) {
                      p.currentName() match {
                        case "~n" =>
                          if (p.nextToken() == JsonToken.VALUE_STRING)
                            slot = childSlot.getOrElse(p.getText, -1)
                        case "~c" =>
                          if (p.nextToken() == JsonToken.START_ARRAY) {
                            var k = p.nextToken()
                            while (k != JsonToken.END_ARRAY && k != null) {
                              if (k == JsonToken.VALUE_STRING) {
                                if (buf.length > 0) buf.append(' ')
                                buf.append(p.getText)
                              } else if (k == JsonToken.START_OBJECT ||
                                  k == JsonToken.START_ARRAY)
                                p.skipChildren()
                              k = p.nextToken()
                            }
                          } else p.skipChildren()
                        case _ =>
                          p.nextToken(); p.skipChildren()
                      }
                    }
                    if (slot >= 0 && buf.length > 0) {
                      if (texts(slot) == null) texts(slot) = buf
                      else {
                        texts(slot).append(' ').append(buf); ()
                      }
                    }
                  } else if (tok == JsonToken.START_ARRAY) p.skipChildren()
                  tok = p.nextToken()
                }
              }
            case _ =>
              p.nextToken(); p.skipChildren()
          }
        }
      }
      p.close()
    } catch {
      case e: Exception =>
        // the member encoding is the engine's own StAX output — a parse
        // failure (truncation, corruption) is a real bug signal, and a
        // half-filled typed row would make pushed typed filters silently
        // DROP members the variant walk matches. Fail loudly, like every
        // other corrupt-sidecar path (config, shred marker).
        throw new IllegalStateException(
          s"xml_member_shape: corrupt member encoding: ${e.getMessage}", e)
    }
    var i = 0
    while (i < texts.length) {
      if (texts(i) != null) setTyped(t, i, texts(i).toString)
      i += 1
    }
    out
  }

  /** Convert + store one field value; unparseable → null (try_cast). */
  private def setTyped(row: org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow, slot: Int, s: String): Unit =
    slotType(slot) match {
      case "bigint" =>
        try row.update(slot, java.lang.Long.parseLong(s.trim))
        catch { case _: NumberFormatException => () }
      case "double" =>
        try row.update(slot, java.lang.Double.parseDouble(s.trim))
        catch { case _: NumberFormatException => () }
      case _ => row.update(slot, UTF8String.fromString(s))
    }

  override protected def withNewChildInternal(
      newChild: Expression): XmlMemberShape = copy(child = newChild)
}
