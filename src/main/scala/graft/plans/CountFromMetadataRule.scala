package graft.plans

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

import scala.jdk.CollectionConverters._

/** Metadata-only count rewrite (SURVEY.md §4.1 row 0b — the reference's
  * `ArrayCountToSizeStage` answers `count(E[])` from stored childCount
  * metadata; the Spark analog answers `SELECT count(*)` over a
  * graft-temporal scan from parquet footer row counts).
  *
  * Matches an ungrouped all-`count(1)` Aggregate sitting directly on a
  * [[graft.sources.GraftTable]] V2 relation (optionally through a trivial
  * Project) with no filters, and replaces the whole subtree with a
  * one-row LocalRelation — zero tasks, zero bytes scanned, regardless of
  * snapshot size. Footer reads are driver-side and touch only file
  * metadata (the same O(files) cost as planning the scan it replaces).
  *
  * Install: `CountFromMetadataRule.install(spark)` (runtime,
  * `spark.experimental.extraOptimizations`) or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
case class CountFromMetadataRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isCountLiteral(e: NamedExpression): Boolean = e match {
    // count(NULL) is always 0, not the row count — require a non-null literal
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), Complete, false, None, _), _) =>
      v != null
    case _ => false
  }

  private def graftTableOf(plan: LogicalPlan): Option[graft.sources.GraftTable] =
    plan match {
      case r: DataSourceV2Relation =>
        r.table match {
          // a delta table's revision dirs hold change records, not rows —
          // footer counts would overcount (DeltaReconstructRule normally
          // rewrites these relations away before this rule can see them)
          case t: graft.sources.GraftTable if !t.isDeltaLayout => Some(t)
          case _ => None
        }
      // post-pushdown shape: rewrite ONLY if nothing was pushed into the
      // scan — a fully-pushed partition filter (e.g. rev = 2) leaves no
      // Filter node in the plan, and a footer count would then overcount
      case sr: DataSourceV2ScanRelation =>
        val unfiltered = sr.scan match {
          case ps: ParquetScan =>
            ps.pushedFilters.isEmpty && ps.partitionFilters.isEmpty && ps.dataFilters.isEmpty
          case _ => false
        }
        if (unfiltered) graftTableOf(sr.relation) else None
      // a Project that only drops/reorders attributes cannot change counts
      case Project(projectList, child) if projectList.forall(_.isInstanceOf[Attribute]) =>
        graftTableOf(child)
      case _ => None
    }

  private def rowCountFromFooters(dirs: Seq[String]): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    try {
      var total = 0L
      dirs.foreach { dir =>
        if (!graft.sources.MetaIO.exists(dir)) return None
        // MetaIO mirrors Spark's file listing: hidden (_/.-prefixed) path
        // segments — _commits, _proj projections, .crc files — are skipped
        graft.sources.MetaIO.listDataFiles(dir, ".parquet").foreach { f =>
          val in = HadoopInputFile.fromPath(f, conf)
          val reader = ParquetFileReader.open(in)
          try total += reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
          finally reader.close()
        }
      }
      Some(total)
    } catch { case _: Exception => None }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountLiteral) =>
      graftTableOf(child).flatMap(t => rowCountFromFooters(t.resolvedDataPaths)) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
        case None => agg
      }
  }
}

object CountFromMetadataRule {
  /** Runtime installation on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[CountFromMetadataRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CountFromMetadataRule(spark)
}
