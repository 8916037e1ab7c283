package graft.sources

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** V2 `TableCatalog` over a warehouse of graft temporal tables — the SQL
  * face of `jn:doc(db, res[, rev])` / `jn:open(db, res, ts)` (reference:
  * bundles/sirix-query/src/main/java/io/sirix/query/function/jn/io/
  * Doc.java:31, DocByPointInTime.java:32):
  *
  * {{{
  * spark.conf: spark.sql.catalog.graft = graft.sources.GraftCatalog
  *             spark.sql.catalog.graft.warehouse = /data/graft
  *
  * SELECT * FROM graft.db.res                      -- latest revision
  * SELECT * FROM graft.db.res VERSION AS OF 2      -- jn:doc(db,res,2)
  * SELECT * FROM graft.db.res TIMESTAMP AS OF '...'-- jn:open(db,res,ts)
  * }}}
  *
  * Identifier `db.res` maps to `<warehouse>/db/res`; Spark's own parser
  * routes `VERSION AS OF` / `TIMESTAMP AS OF` to the version/timestamp
  * `loadTable` overloads, which pin the revision against the commit log —
  * the same partition-directory pruning as the reader options API, no new
  * scan machinery. Writes stay on the `graft-temporal` format / library
  * API (the reference's store surface); DROP TABLE works. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at the graft warehouse root"))
  }

  override def name(): String = catalogName

  /** Identifier parts become filesystem path segments — reject anything
    * that could escape the warehouse root (backquoted identifiers may
    * contain `/` or `..`; `DROP NAMESPACE` deletes recursively). */
  private def safeSegment(s: String): String = {
    require(s.matches("[A-Za-z0-9_.-]+") && s != "." && s != "..",
      s"identifier part '$s' is not a safe path segment")
    s
  }

  private def pathOf(ident: Identifier): String =
    ((ident.namespace() :+ ident.name()).map(safeSegment))
      .mkString(s"$warehouse/", "/", "")

  private def nsPath(namespace: Array[String]): String =
    (warehouse +: namespace.toSeq.map(safeSegment)).mkString("/")

  private def requireExists(ident: Identifier): String = {
    val p = pathOf(ident)
    if (!TemporalTable.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    p
  }

  private def table(p: String, extra: Map[String, String]): Table =
    new GraftTable(new CaseInsensitiveStringMap(
      (Map("path" -> p) ++ extra).asJava))

  override def loadTable(ident: Identifier): Table =
    table(requireExists(ident), Map.empty)

  /** `VERSION AS OF <rev>` — revision pin, validated against the commit
    * log (a reserved-but-uncommitted `rev=N/` directory must never serve
    * reads — snapshot isolation). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = requireExists(ident)
    val rev = scala.util.Try(version.toInt).getOrElse(
      throw new IllegalArgumentException(s"revision must be an integer, got '$version'"))
    if (!TemporalTable.commits(p).exists(_.revision == rev))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    table(p, Map("revision" -> version))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    table(requireExists(ident), Map("asOfTimestampMs" -> (timestamp / 1000L).toString))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    val dir = nsPath(namespace)
    MetaIO.list(dir)
      .filter(n => TemporalTable.exists(s"$dir/$n"))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    TemporalTable.exists(pathOf(ident))

  override def dropTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    val existed = TemporalTable.exists(p)
    if (existed) TemporalTable.drop(p)
    existed
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      "create graft tables via TemporalTable.write / the graft-temporal format " +
        "(every write is a revision commit)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft tables are append-only revisions")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "rename not supported; use TemporalTable.copy")

  // ---- namespaces = warehouse subdirectories ----

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    val dir = nsPath(namespace)
    MetaIO.listDirs(dir)
      .filterNot(n => TemporalTable.exists(s"$dir/$n")) // tables aren't namespaces
      .map(n => namespace :+ n).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || MetaIO.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit =
    MetaIO.mkdirs(nsPath(namespace))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    val existed = MetaIO.exists(p)
    if (existed) {
      if (!cascade && MetaIO.list(p).nonEmpty)
        throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
          namespace)
      MetaIO.delete(p, recursive = true)
    }
    existed
  }
}
