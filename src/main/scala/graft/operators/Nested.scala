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

  /** All dotted paths in `schema` whose leaf field equals `field`,
    * depth-first in declaration order (document order). Struct branches are
    * searched; a matching name terminates its branch (first-match-per-
    * branch, like the reference). */
  def descendantPaths(schema: StructType, field: String): Seq[String] = {
    def walk(st: StructType, prefix: String): Seq[String] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        if (f.name == field) Seq(p)
        else f.dataType match {
          case s: StructType => walk(s, p)
          case _ => Seq.empty
        }
      }
    walk(schema, "")
  }

  /** `$o=>>field` returning the FIRST match in document order (null when
    * the document has no such field — JSONiq missing-field semantics). */
  def derefDescendant(df: DataFrame, field: String): Column = {
    val paths = descendantPaths(df.schema, field)
    if (paths.isEmpty) lit(null)
    else coalesce(paths.map(col): _*)
  }

  /** All matches of `field` at any depth, as an array in document order. */
  def derefDescendantAll(df: DataFrame, field: String): Column = {
    val paths = descendantPaths(df.schema, field)
    if (paths.isEmpty) array()
    else array(paths.map(col): _*)
  }

  /** Truncate a struct column to `maxLevel` nesting levels (level 1 = the
    * struct's own fields; deeper struct fields are dropped). */
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
}
