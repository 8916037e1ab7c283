package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import scala.jdk.CollectionConverters._

/** The shared "unfiltered parquet scan" scope check for the
  * footer-metadata rules ([[CountFromMetadataRule]],
  * [[MinMaxFromMetadataRule]]) — ONE definition on purpose: the two
  * copies had already drifted (different listing helpers), and every
  * scope fix must hold for both or the rules silently diverge.
  *
  * A scope is the exact (path, length, mtime) file list of the scan the
  * rewrite would replace, plus the PARTITION column names: a partition
  * column's values come from the directory layout, not the files — data
  * files can carry a same-named SHADOW column (the V2 pre-strip append
  * leaves an all-null one; foreign writers arbitrary ones), and folding
  * its footer stats would silently answer `min(rev)` with the shadow's
  * values instead of the scan's directory-derived ones.
  *
  * File lists are strict: every non-hidden file of a graft-table
  * revision dir must end in `.parquet`, else the scope is refused — the
  * replaced scan reads EVERY non-hidden file as parquet, so a footer
  * fold over a suffix-filtered subset would silently undercount. */
private[plans] object ParquetScanScope {

  final case class Scope(files: Seq[(String, Long, Long)],
                         partitionCols: Set[String])

  def of(plan: LogicalPlan): Option[Scope] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
        // the index's own listing IS what the scan reads — no suffix
        // filtering needed on this path
        Some(Scope(
          fs.location.listFiles(Nil, Nil).flatMap(_.files)
            .map(f => (f.getPath.toString, f.getLen, f.getModificationTime)),
          fs.partitionSchema.fieldNames.toSet))
      case _ => None
    }
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: graft.sources.GraftTable if !t.isDeltaLayout =>
          val all = t.resolvedDataPaths.flatMap(d =>
            graft.sources.MetaIO.listDataFileStatus(d, ""))
          if (all.exists(!_.getPath.getName.endsWith(".parquet"))) None
          else Some(Scope(
            all.map(s => (s.getPath.toString, s.getLen, s.getModificationTime)),
            Set("rev")))
        case _ => None
      }
    case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      val unfiltered = sr.scan match {
        case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          ps.pushedFilters.isEmpty && ps.partitionFilters.isEmpty && ps.dataFilters.isEmpty
        case _ => false
      }
      if (unfiltered) of(sr.relation) else None
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[Attribute]) =>
      of(child)
    case _ => None
  }

  /** Footer key that marks legacy (hybrid Julian) date/timestamp rebase:
    * the scan rebases such values on read (or raises under EXCEPTION
    * mode) — raw footer stats would differ by up to ~10 days for
    * pre-1582 dates, so metadata folds must bail on these files. */
  val LegacyRebaseKey = "org.apache.spark.legacyDateTime"

  /** Bounded LRU for footer row counts, keyed by the exact file list
    * (the MetaIO entry-cache discipline — clear-all-at-capacity caused
    * thundering refetches). Shared across both rules' count folds. */
  private val countCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[Seq[(String, Long, Long)], Option[Long]](
          16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Seq[(String, Long, Long)], Option[Long]]): Boolean =
          size() > 64
      })

  /** Total footer row count over `files` — parallel, memoized; None on
    * any unreadable footer (degrade to the scan). */
  def rowCount(files: Seq[(String, Long, Long)], conf: Configuration): Option[Long] = {
    val hit = countCache.get(files)
    if (hit != null) return hit
    val computed: Option[Long] =
      try {
        val partials = graft.sources.MetaIO.parallelMap(files) { case (f, _, _) =>
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f), conf))
          try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
          finally reader.close()
        }
        Some(partials.sum)
      } catch { case _: Exception => None }
    countCache.put(files, computed)
    computed
  }
}
