package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 temporal table format (SURVEY.md §4.3 item 1):
  *
  * {{{
  * spark.read.format("graft-temporal").load(path)                    // latest
  * spark.read.format("graft-temporal").option("revision", 2).load(path)
  * spark.read.format("graft-temporal").option("asOfTimestampMs", ts).load(path)
  * spark.read.format("graft-temporal").option("allRevisions", true).load(path)
  * }}}
  *
  * Mirrors `jn:doc(db,res[,rev])` / `jn:open(db,res,ts)` (reference:
  * bundles/sirix-query/src/main/java/io/sirix/query/function/jn/io/Doc.java:31,
  * DocByPointInTime.java:32). Revision resolution happens in the provider
  * against the (tiny, driver-side) commit log; the scan itself delegates to
  * Spark's native parquet V2 table, so predicate pushdown, column pruning,
  * vectorized decode and row-group skipping all apply unchanged — the
  * physical layer the reference implements by hand (PAX regions, zone maps)
  * is inherited from Parquet+Catalyst.
  *
  * Snapshot directories are hive-style (`rev=N/`), so the revision number
  * surfaces as a partition column `rev`: an `allRevisions` read over the
  * whole table prunes revisions via ordinary partition pruning — a filter
  * `rev = 7` never lists or reads any other revision's files, which is what
  * keeps time travel O(snapshot) at 100 TB history.
  *
  * Writes go through [[TemporalTable.write]] (the commit protocol needs the
  * log append); the V2 path is read-only by design in this version.
  */
class GraftTemporalSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-temporal"

  override def supportsExternalMetadata(): Boolean = false

  private def delegate(options: CaseInsensitiveStringMap): ParquetTable = {
    val spark = SparkSession.active
    val tablePath = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-temporal requires a path"))
    val all = options.getBoolean("allRevisions", false)
    val dataPaths =
      if (all) Seq(tablePath)
      else {
        val rev =
          if (options.containsKey("revision")) options.getInt("revision", -1)
          else if (options.containsKey("asOfTimestampMs")) {
            val ts = options.getLong("asOfTimestampMs", Long.MaxValue)
            val eligible = TemporalTable.commits(tablePath).filter(_.commitTsMs <= ts)
            require(eligible.nonEmpty, s"no revision at or before ts=$ts")
            eligible.last.revision
          } else TemporalTable.mostRecentRevision(tablePath).getOrElse(
            throw new IllegalArgumentException(s"no commits at $tablePath"))
        Seq(s"$tablePath/rev=$rev")
      }
    val opts = new CaseInsensitiveStringMap(
      (options.asCaseSensitiveMap().asScala.toMap ++ Map("basePath" -> tablePath)).asJava)
    ParquetTable(s"graft-temporal $tablePath", spark, opts, dataPaths,
      None, classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    delegate(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    delegate(new CaseInsensitiveStringMap(properties))
}
