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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountLiteral) =>
      // scope + footer fold through the SHARED helper (one definition
      // with MinMaxFromMetadataRule: delta refusal, unfiltered-scan
      // check, strict file lists, parallel memoized footer reads)
      ParquetScanScope.of(child)
        .flatMap(sc => ParquetScanScope.rowCount(sc.files,
          spark.sparkContext.hadoopConfiguration)) match {
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
