package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.sources.StatsSidecar

/** Aggregate-from-sidecar rewrite — the SUM/NDV extension of
  * [[MinMaxFromMetadataRule]] (which see for the zone-map analogy and the
  * reference citation). Parquet footers cannot serve `SUM`, `AVG` or
  * `COUNT(DISTINCT …)`; a [[graft.sources.StatsSidecar]] written by the
  * table's writer can. This rule matches an ungrouped Aggregate whose
  * every output is one of
  *
  *   `sum(intCol)` · `avg(intCol)` · `min(intCol)` · `max(intCol)` ·
  *   `count(1)` · `count(col)` · `count(distinct col)`
  *
  * over an UNFILTERED parquet relation (V1, or a graft-temporal V2
  * snapshot; attribute-only Projects allowed, any Filter disqualifies —
  * same scope discipline as [[MinMaxFromMetadataRule]]) whose scan
  * directories all carry FRESH sidecars, and replaces the subtree with a
  * one-row LocalRelation: zero tasks, zero data bytes, at any table size.
  *
  * Freshness: the rule re-lists each directory's parquet files (the same
  * listing the sidecar writer used) and requires the recorded
  * (relative path, length, mtime) set to match exactly; any append,
  * delete, or in-place rewrite disables the fold — degrade to the scan,
  * never to a stale answer.
  *
  * Merge across multiple directories (multi-root reads, multi-revision
  * history frames): rows/counts/sums add, min/max fold — but NDV is not
  * additive, so `count(distinct …)` folds only from a single directory.
  *
  * AVG semantics: the fold computes exact-long-sum / non-null-count in
  * double arithmetic and fires only when |sum| ≤ 2^53 (exactly
  * representable), where the division is the correctly-rounded true mean
  * — bit-identical to an exact-arithmetic oracle. Spark's own scan-side
  * Average accumulates in floating point, so at that magnitude the fold
  * is at least as accurate as the plan it replaces.
  */
case class AggFromStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private sealed trait Req { def a: AttributeReference }
  private case class SumOf(a: AttributeReference) extends Req
  private case class AvgOf(a: AttributeReference) extends Req
  private case class MinOf(a: AttributeReference) extends Req
  private case class MaxOf(a: AttributeReference) extends Req
  private case class CountCol(a: AttributeReference) extends Req
  private case class NdvOf(a: AttributeReference) extends Req
  private case object CountStar extends Req {
    def a: AttributeReference = null
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def reqOf(ne: NamedExpression): Option[Req] = ne match {
    case Alias(AggregateExpression(f, Complete, isDistinct, None, _), _) =>
      (f, isDistinct) match {
        case (s: Sum, false) => s.child match {
          case a: AttributeReference if integral(a.dataType) => Some(SumOf(a))
          case _ => None
        }
        case (av: Average, false) => av.child match {
          case a: AttributeReference if integral(a.dataType) => Some(AvgOf(a))
          case _ => None
        }
        case (Min(a: AttributeReference), false) if integral(a.dataType) => Some(MinOf(a))
        case (Max(a: AttributeReference), false) if integral(a.dataType) => Some(MaxOf(a))
        case (Count(Seq(Literal(v, _))), false) if v != null => Some(CountStar)
        case (Count(Seq(a: AttributeReference)), false) => Some(CountCol(a))
        case (Count(Seq(a: AttributeReference)), true) => Some(NdvOf(a))
        case _ => None
      }
    case _ => None
  }

  /** The scan directories of an unfiltered parquet read — V1 root paths
    * or graft-temporal V2 snapshot data paths (non-delta; a delta
    * revision dir holds change records, not rows). */
  private def statsDirsOf(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
        Some(fs.location.rootPaths.map(_.toString))
      case _ => None
    }
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: graft.sources.GraftTable if !t.isDeltaLayout =>
          Some(t.resolvedDataPaths)
        case _ => None
      }
    case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      val unfiltered = sr.scan match {
        case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          ps.pushedFilters.isEmpty && ps.partitionFilters.isEmpty && ps.dataFilters.isEmpty
        case _ => false
      }
      if (unfiltered) statsDirsOf(sr.relation) else None
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[Attribute]) =>
      statsDirsOf(child)
    case _ => None
  }

  /** Fresh sidecar for `dir`, or None (absent / unparseable / stale). The
    * freshness listing uses the writer's own listing function, so the
    * compared file sets are defined identically on both sides. */
  private def freshStats(dir: String): Option[StatsSidecar.TableStats] =
    StatsSidecar.read(dir).filter { st =>
      try {
        val dirUri = graft.sources.MetaIO.fs(dir)
          .makeQualified(new org.apache.hadoop.fs.Path(dir)).toString
        val prefix = if (dirUri.endsWith("/")) dirUri else dirUri + "/"
        val current = graft.sources.MetaIO.listDataFileStatus(dir, ".parquet").map { s =>
          (s.getPath.toString.stripPrefix(prefix), s.getLen, s.getModificationTime)
        }
        StatsSidecar.fresh(st, current)
      } catch { case _: Exception => false }
    }

  private val Exact = 1L << 53

  private def toCatalyst(v: Long, dt: DataType): Any = dt match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType => v.toInt
    case LongType => v
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      val reqs = aggExprs.map(reqOf)
      if (reqs.exists(_.isEmpty)) agg
      else statsDirsOf(child) match {
        case Some(dirs) if dirs.nonEmpty =>
          val wanted = reqs.flatten
          val ndvWanted = wanted.exists(_.isInstanceOf[NdvOf])
          if (ndvWanted && dirs.size > 1) agg // NDV is not additive
          else {
            val perDir = dirs.map(freshStats)
            if (perDir.exists(_.isEmpty)) agg
            else {
              val stats = perDir.flatten
              serve(wanted, stats) match {
                case Some(values) =>
                  LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))
                case None => agg
              }
            }
          }
        case _ => agg
      }
  }

  /** Fold the merged answer for each request; None = some statistic is
    * unavailable (column missing from a sidecar, sum overflow guard, …)
    * → caller must not rewrite. */
  private def serve(wanted: Seq[Req], stats: Seq[StatsSidecar.TableStats])
      : Option[Seq[Any]] = {
    val rows = stats.map(_.rows).sum
    def col(name: String): Option[Seq[StatsSidecar.ColStats]] = {
      val per = stats.map(_.cols.get(name))
      if (per.exists(_.isEmpty)) None else Some(per.flatten)
    }
    val out = wanted.map {
      case CountStar => Some(rows)
      case CountCol(a) => col(a.name).map(cs => cs.map(_.count).sum)
      case NdvOf(a) => // single-dir only (enforced by caller)
        col(a.name).flatMap(_.head.ndv)
      case SumOf(a) => col(a.name).flatMap { cs =>
        if (cs.exists(c => c.sum.isEmpty && c.count > 0)) None // no stat
        else {
          val nonNull = cs.map(_.count).sum
          if (nonNull == 0) Some(null)
          else Some(cs.flatMap(_.sum).sum: java.lang.Long)
        }
      }
      case AvgOf(a) => col(a.name).flatMap { cs =>
        if (cs.exists(c => c.sum.isEmpty && c.count > 0)) None
        else {
          val nonNull = cs.map(_.count).sum
          if (nonNull == 0) Some(null)
          else {
            val s = cs.flatMap(_.sum).sum
            if (math.abs(s) > Exact) None // double-exactness guard
            else Some(s.toDouble / nonNull: java.lang.Double)
          }
        }
      }
      case MinOf(a) => col(a.name).flatMap { cs =>
        if (cs.exists(c => c.minMax.isEmpty && c.count > 0)) None
        else {
          val mms = cs.flatMap(_.minMax)
          if (mms.isEmpty) Some(null)
          else Some(toCatalyst(mms.map(_._1).min, a.dataType))
        }
      }
      case MaxOf(a) => col(a.name).flatMap { cs =>
        if (cs.exists(c => c.minMax.isEmpty && c.count > 0)) None
        else {
          val mms = cs.flatMap(_.minMax)
          if (mms.isEmpty) Some(null)
          else Some(toCatalyst(mms.map(_._2).max, a.dataType))
        }
      }
    }
    if (out.exists(_.isEmpty)) None else Some(out.map(_.get))
  }
}

object AggFromStatsRule {
  /** Runtime installation on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[AggFromStatsRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AggFromStatsRule(spark)
}
