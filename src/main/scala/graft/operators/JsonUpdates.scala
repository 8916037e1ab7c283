package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSONiq update expressions as DataFrame column transforms (SURVEY.md
  * §2.14): the reference compiles `insert json` / `delete json` /
  * `replace json value of` / `rename json` to JsonNodeTrx mutations
  * (bundles/sirix-core/src/main/java/io/sirix/api/json/JsonNodeTrx.java:62-228,
  * update queries pinned in JsonIntegrationTest.java:361-509). Here the
  * same edits are pure struct-column rewrites — `withField` / `dropFields`
  * / higher-order `transform` — applied to every document of a DataFrame
  * at once (bulk semantics, per BASELINE.json scope: a new revision is the
  * transformed frame written via [[graft.sources.TemporalTable.write]]).
  *
  * Paths address nested fields with `.` and traverse arrays with a `[]`
  * segment suffix: `"cust.orders[].qty"` rewrites field `qty` inside every
  * element of the `cust.orders` array — the per-element rewrite runs
  * inside `transform`, so it is map-side, codegen'd, and never explodes
  * the array.
  *
  * All helpers return a COLUMN to substitute for the document column
  * (`df.withColumn(doc, JsonUpdates.insertField(col(doc), "a.b", lit(1)))`),
  * composing freely with each other and with [[Nested]] navigation.
  */
object JsonUpdates {

  private case class Seg(name: String, intoArray: Boolean)

  private def parse(path: String): List[Seg] = {
    require(path.nonEmpty, "empty update path")
    path.split('.').toList.map { s =>
      if (s.endsWith("[]")) Seg(s.dropRight(2), intoArray = true)
      else Seg(s, intoArray = false)
    }
  }

  /** Rewrite the value AT `path` below `doc`: descend struct segments with
    * `getField`, array segments with `transform`, then apply
    * `edit(parentCol, leafName)` to produce the replacement parent struct.
    * The terminal segment is always a plain field (enforced by callers). */
  private def rewrite(doc: Column, segs: List[Seg],
                      edit: (Column, String) => Column): Column =
    segs match {
      case Seg(name, false) :: Nil =>
        edit(doc, name)
      case Seg(name, false) :: rest =>
        doc.withField(name, rewrite(doc.getField(name), rest, edit))
      case Seg(name, true) :: rest =>
        doc.withField(name,
          transform(doc.getField(name), e => rewrite(e, rest, edit)))
      case _ =>
        throw new IllegalArgumentException("path must end in a plain field")
    }

  /** `insert json {field: value} into $doc.path` — add (or overwrite) the
    * field at `path` with `value`. The last path segment is the NEW field
    * name; everything before it must exist. */
  def insertField(doc: Column, path: String, value: Column): Column = {
    val segs = parse(path)
    require(!segs.last.intoArray, "terminal segment of insertField must be a field")
    rewrite(doc, segs, (parent, leaf) => parent.withField(leaf, value))
  }

  /** `replace json value of $doc.path with value` — same mechanics as
    * insert (withField overwrites); provided as its own name to mirror the
    * reference surface. */
  def replaceValue(doc: Column, path: String, value: Column): Column =
    insertField(doc, path, value)

  /** Element-dependent replace: the new value is computed FROM the leaf's
    * parent struct (`value(parent)`), so a path through `[]` segments can
    * rewrite each array element in terms of its own fields —
    * `mapField(doc, "lines[].amt")(p => p.getField("amt") * 2)` doubles
    * every line amount in place. */
  def mapField(doc: Column, path: String)(value: Column => Column): Column = {
    val segs = parse(path)
    require(!segs.last.intoArray, "terminal segment of mapField must be a field")
    rewrite(doc, segs, (parent, leaf) => parent.withField(leaf, value(parent)))
  }

  /** `delete json $doc.path` — remove the field at `path`. */
  def removeField(doc: Column, path: String): Column = {
    val segs = parse(path)
    require(!segs.last.intoArray, "terminal segment of removeField must be a field")
    rewrite(doc, segs, (parent, leaf) => parent.dropFields(leaf))
  }

  /** `rename json $doc.path as newName` — keep the value, change the key.
    * The renamed field moves to the END of its struct (Spark's withField
    * appends); serializers that care about key order should re-project. */
  def renameField(doc: Column, path: String, newName: String): Column = {
    val segs = parse(path)
    require(!segs.last.intoArray, "terminal segment of renameField must be a field")
    rewrite(doc, segs, (parent, leaf) =>
      parent.withField(newName, parent.getField(leaf)).dropFields(leaf))
  }

  /** `append json value into $doc.arrayPath` — push an element onto the
    * array at `path` (JsonNodeTrx.insertSubtreeAsLastChild over an array
    * node). */
  def appendToArray(doc: Column, path: String, element: Column): Column = {
    val segs = parse(path)
    require(!segs.last.intoArray, "address the array FIELD (no [] suffix)")
    rewrite(doc, segs, (parent, leaf) =>
      parent.withField(leaf,
        concat(parent.getField(leaf), array(element))))
  }
}
