package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-document navigation (SURVEY.md §2.2).
  *
  * The reference's descendant deref `$o=>>field` finds a field at ANY depth
  * with first-match-per-branch semantics
  * (bundles/sirix-query/src/main/java/io/sirix/query/compiler/translator/
  * DerefDescendantExpr.java). Spark has no such primitive — but the schema
  * is static, so the search runs at PLAN TIME: we walk the StructType,
  * enumerate every path ending in the field, and emit a coalesce (first
  * match in document order) or array of all matches. The runtime plan is
  * plain nested-field extraction — fully codegen'd, no recursion on the
  * data path, and column pruning still reaches the scan.
  *
  * The serializer depth limits (`maxLevel` — reference:
  * service/json/serialize/JsonSerializer.java:68) work the same way:
  * rebuild the struct at plan time keeping only levels ≤ maxLevel, then
  * `to_json` the truncated value.
  */
object Nested {

  /** Dotted struct-only paths whose leaf field equals `field`, depth-first
    * in declaration order. A matching name terminates its branch
    * (first-match-per-branch, like the reference). Paths that cross an
    * array have no dotted-string form and are excluded here — the deref
    * builders below search them too. */
  def descendantPaths(schema: StructType, field: String): Seq[String] =
    descendantSegPaths(schema, field).map(_.mkString("."))

  /** The same paths as SEGMENT lists — the form column construction must
    * use: a dotted string cannot represent a field whose NAME contains a
    * dot (`col("a.b")` parses as nested access, resolving the wrong field
    * or failing). */
  private def descendantSegPaths(schema: StructType,
                                 field: String): Seq[Seq[String]] = {
    def walk(st: StructType, prefix: Seq[String]): Seq[Seq[String]] =
      st.fields.toSeq.flatMap { f =>
        val p = prefix :+ f.name
        if (f.name == field) Seq(p)
        else f.dataType match {
          case s: StructType => walk(s, p)
          case _ => Seq.empty
        }
      }
    walk(schema, Seq.empty)
  }

  /** Top-level column reference by EXACT name (backtick-quoted — a name
    * containing a dot must not parse as nested access). */
  private def qcol(name: String): Column =
    col(s"`${name.replace("`", "``")}`")

  /** Nested access from exact segment names (getField never re-parses). */
  private def segCol(segs: Seq[String]): Column =
    segs.tail.foldLeft(qcol(segs.head))(_.getField(_))

  /** Does any match of `field` sit under an array in this subtree? */
  private def hasArrayMatch(dt: DataType, field: String, inArray: Boolean = false): Boolean =
    dt match {
      case s: StructType => s.fields.exists { f =>
        (f.name == field && inArray) || hasArrayMatch(f.dataType, field, inArray)
      }
      case ArrayType(e, _) => hasArrayMatch(e, field, inArray = true)
      case _ => false
    }

  private def containsMatch(dt: DataType, field: String): Boolean = dt match {
    case s: StructType =>
      s.fields.exists(f => f.name == field || containsMatch(f.dataType, field))
    case ArrayType(e, _) => containsMatch(e, field)
    case _ => false
  }

  /** ALL matches of `field` under a struct accessed via `get`, as one flat
    * array in TRUE document order — element 0's whole subtree precedes
    * element 1's (array branches become `transform`/`flatten` chains,
    * all codegen'd built-ins; the schema recursion happens at plan time
    * only). `None` when the subtree statically contains no match. */
  private def matchesIn(st: StructType, get: String => Column,
                        field: String): Option[Column] = {
    val segs = st.fields.toSeq.flatMap { f =>
      val fc = get(f.name)
      if (f.name == field) Some(array(fc))
      else matchesOf(f.dataType, fc, field)
    }
    if (segs.isEmpty) None
    else if (segs.size == 1) Some(segs.head)
    else Some(concat(segs: _*))
  }

  private def matchesOf(dt: DataType, c: Column, field: String): Option[Column] =
    dt match {
      case s: StructType => matchesIn(s, c.getField, field)
      case at @ ArrayType(e, _) if containsMatch(e, field) =>
        // a NULL array must contribute no matches, not null-propagate the
        // whole result through concat/flatten
        Some(flatten(transform(coalesce(c, array().cast(at)),
          x => matchesOf(e, x, field).get)))
      case _ => None
    }

  /** `$o=>>field` returning the FIRST match in document order (null when
    * the document has no such field — JSONiq missing-field semantics).
    * Searches struct AND array branches — a field under `array<struct>`
    * (order line-items, message lists) is found like the reference's
    * DerefDescendantExpr finds it. */
  def derefDescendant(df: DataFrame, field: String): Column = {
    if (!hasArrayMatch(df.schema, field)) {
      // struct-only schema: plain nested-field coalesce (narrowest plan)
      val paths = descendantSegPaths(df.schema, field)
      if (paths.isEmpty) lit(null) else coalesce(paths.map(segCol): _*)
    } else {
      val all = matchesIn(df.schema, qcol, field).get
      // `get` (not element_at) — returns null on empty under ANSI mode
      get(filter(all, _.isNotNull), lit(0))
    }
  }

  /** All matches of `field` at any depth, as one flat array in document
    * order (array-borne matches contribute one entry per element). */
  def derefDescendantAll(df: DataFrame, field: String): Column =
    matchesIn(df.schema, qcol, field).getOrElse(array())

  /** Truncate a struct column to `maxLevel` STRUCT-nesting levels
    * (level 1 = the struct's own fields; deeper struct fields are
    * dropped). Arrays are transparent containers — they do not consume a
    * level, but their element structs DO and are truncated like any
    * other (previously structs inside arrays bypassed the limit
    * entirely, serializing unbounded depth); an array whose element type
    * truncates away drops with its subtree. */
  def truncateToLevel(c: Column, dt: DataType, maxLevel: Int): Option[Column] =
    dt match {
      case st: StructType =>
        if (maxLevel <= 0) None
        else {
          val kept = st.fields.toSeq.flatMap { f =>
            truncateToLevel(c.getField(f.name), f.dataType, maxLevel - 1)
              .map(_.as(f.name))
          }
          if (kept.isEmpty) None else Some(struct(kept: _*))
        }
      case ArrayType(e, _) =>
        if (maxLevel <= 0) None
        else e match {
          case _: StructType | _: ArrayType =>
            // rebuild each element truncated; None when nothing survives
            truncateToLevel(lit(null), e, maxLevel) match {
              case Some(_) => Some(transform(c,
                x => truncateToLevel(x, e, maxLevel).get))
              case None => None
            }
          case _ => Some(c)
        }
      case _ => Some(c)
    }

  /** `sdb:serialize` with `maxLevel`: JSON text of the value truncated to
    * the given depth. */
  def toJsonLimited(df: DataFrame, colName: String, maxLevel: Int): Column = {
    val dt = df.schema(colName).dataType
    truncateToLevel(col(colName), dt, maxLevel) match {
      case Some(c) => to_json(c)
      case None => lit("{}")
    }
  }

  /** Truncate every ARRAY in the value to its first `maxChildren` elements,
    * recursively (the serializer's `maxChildNodes` option —
    * service/json/serialize/JsonMaxLevelMaxNodesMaxChildNodesVisitor.java).
    * Struct fan-out is schema-bounded, so with [[truncateToLevel]] this
    * also bounds total serialized nodes (the `maxNodes` budget is ≤
    * fields^maxLevel × maxChildren^arrayDepth — pick the two knobs from
    * it). Pure slice/transform — codegen'd, no explode. */
  def truncateChildren(c: Column, dt: DataType, maxChildren: Int): Column =
    dt match {
      case at: org.apache.spark.sql.types.ArrayType =>
        transform(slice(c, 1, maxChildren),
          e => truncateChildren(e, at.elementType, maxChildren))
      case st: StructType =>
        struct(st.fields.toSeq.map(f =>
          truncateChildren(c.getField(f.name), f.dataType, maxChildren)
            .as(f.name)): _*)
      case _ => c
    }

  /** `sdb:serialize` with BOTH limits: depth-truncate to `maxLevel`, then
    * cap every array at `maxChildren` elements. */
  def toJsonLimited(df: DataFrame, colName: String, maxLevel: Int,
                    maxChildren: Int): Column = {
    val dt = df.schema(colName).dataType
    truncateToLevel(col(colName), dt, maxLevel) match {
      case Some(c) =>
        // re-derive the truncated type to drive the array walk
        val kept = df.select(c.as("__t")).schema("__t").dataType
        to_json(truncateChildren(c, kept, maxChildren))
      case None => lit("{}")
    }
  }
}
