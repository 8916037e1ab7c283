package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Metadata-only min/max rewrite — the zone-map half of the reference's
  * page-level statistics (page/pax/NumberZoneMapRegion.java:63 keeps
  * per-region min/max so scans answer range extremes without touching
  * values; parquet footers carry the identical statistic per row group).
  *
  * Matches an ungrouped Aggregate of only `min(col)` / `max(col)` /
  * `count(1)` over an UNFILTERED parquet relation (V1 `LogicalRelation`,
  * optionally through an attribute-only Project — a Filter node anywhere
  * below disqualifies the plan, and V1 pushdown has not happened yet at
  * optimizer time, so any filter is still visible here) and replaces the
  * subtree with a one-row LocalRelation folded from row-group statistics:
  * zero tasks, zero data bytes, at any table size.
  *
  * Only integral-ish columns participate (byte/short/int/long/date):
  * their parquet statistics are totally ordered and exact. Doubles are
  * excluded (NaN makes parquet float stats untrustworthy by spec) and
  * strings are excluded (footer min/max may be truncated). Any row group
  * with absent or non-null-less statistics aborts the rewrite — correct
  * answers degrade to the ordinary scan, never to a guess. All-null row
  * groups are skipped; an all-null column yields SQL's null min/max.
  *
  * Footer reads are driver-side with bounded parallelism (the same
  * O(files) metadata cost as planning the scan this replaces — and the
  * same posture as [[CountFromMetadataRule]], which see).
  */
case class MinMaxFromMetadataRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private sealed trait Req
  private case class MinOf(a: AttributeReference) extends Req
  private case class MaxOf(a: AttributeReference) extends Req
  private case object CountAll extends Req

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => true
    case _ => false
  }

  private def reqOf(ne: NamedExpression): Option[Req] = ne match {
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _)
        if supported(a.dataType) => Some(MinOf(a))
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _)
        if supported(a.dataType) => Some(MaxOf(a))
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), Complete, false, None, _), _)
        if v != null => Some(CountAll)
    case _ => None
  }

  /** The parquet files of an unfiltered scan — as (path, length, mtime)
    * triples, so the stats cache key changes whenever a file is rewritten
    * IN PLACE under the same name (external writers produce deterministic
    * part names; a stale fold would be a wrong answer with no scan to
    * catch it) — if the child is exactly that (attribute-only Projects
    * allowed, nothing else). Covers V1 parquet relations and unfiltered
    * graft-temporal V2 snapshots (the same scope split as
    * [[CountFromMetadataRule.graftTableOf]]). */
  /** Per-column fold state over row groups: (min, max) as longs, plus
    * whether any non-null value was seen. */
  private final class Acc {
    var seen = false
    var lo = Long.MaxValue
    var hi = Long.MinValue
  }

  private def asLong(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue())
    case l: java.lang.Long => Some(l.longValue())
    case _ => None
  }

  /** Memo for folded footers — the optimizer batch runs to fixed point
    * and every explain() recompiles, so without it a bailing table would
    * re-open all O(files) footers per compilation. Keyed by the exact
    * file list WITH per-file (length, mtime): Spark writers produce fresh
    * part names, and a file rewritten in place under the SAME name
    * (external writers — DuckDB COPY's deterministic data_0.parquet,
    * manual replacement) changes size or mtime and misses the cache, so a
    * stale fold is never served. Bounded (cleared at 64 entries);
    * negative results are cached too. */
  // bounded LRU (the MetaIO entry-cache discipline): clear-all-at-
  // capacity evicted every hot fold at once — the 65th distinct query
  // shape forced O(files) footer re-reads for every previously-hot table
  private val statsCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[
          (Seq[(String, Long, Long)], Seq[String]),
          Option[(Map[String, Acc], Long)]](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Seq[(String, Long, Long)], Seq[String]),
              Option[(Map[String, Acc], Long)]]): Boolean = size() > 64
      })

  private def foldStats(files: Seq[(String, Long, Long)], cols: Seq[String])
      : Option[(Map[String, Acc], Long)] = {
    val key = (files, cols)
    val hit = statsCache.get(key)
    if (hit != null) hit
    else {
      val computed = foldStatsUncached(files, cols)
      statsCache.put(key, computed)
      computed
    }
  }

  /** Fold footer statistics for `cols` across all files. None = any
    * statistic absent/untrustworthy → caller must not rewrite. Files are
    * read concurrently into per-file partials (no shared mutable state on
    * pool threads) and merged on the calling thread. */
  private def foldStatsUncached(fileMetas: Seq[(String, Long, Long)], cols: Seq[String])
      : Option[(Map[String, Acc], Long)] = {
    val files = fileMetas.map(_._1)
    val conf = spark.sparkContext.hadoopConfiguration
    // per-file partial: rows + per-col Some((lo, hi)) / None (col all-null
    // in this file); outer None = untrustworthy stats somewhere
    def one(file: String): Option[(Long, Map[String, Option[(Long, Long)]])] = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
      try {
        // legacy (hybrid Julian) rebase marker: the scan REBASES such
        // files' date values on read (or raises under EXCEPTION mode) —
        // raw footer stats can be ~10 days off for pre-1582 dates; bail
        if (reader.getFooter.getFileMetaData.getKeyValueMetaData
            .containsKey(ParquetScanScope.LegacyRebaseKey)) return None
        var rows = 0L
        val local = scala.collection.mutable.Map.empty[String, Option[(Long, Long)]]
        cols.foreach(local(_) = None)
        val ok = reader.getFooter.getBlocks.asScala.forall { block =>
          rows += block.getRowCount
          cols.forall { c =>
            block.getColumns.asScala.find(_.getPath.toDotString == c) match {
              case None => false // column absent from this file: bail
              case Some(chunk) =>
                // trust only signed int32/int64 statistics: an UNSIGNED
                // logical type (Spark reads UINT32 as long) carries
                // unsigned-comparator stats that a signed fold would
                // misorder — bail to the scan
                val prim = chunk.getPrimitiveType
                val signedInt = (prim.getPrimitiveTypeName ==
                    org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 ||
                  prim.getPrimitiveTypeName ==
                    org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64) &&
                  (prim.getLogicalTypeAnnotation match {
                    case null => true
                    case i: org.apache.parquet.schema.LogicalTypeAnnotation
                        .IntLogicalTypeAnnotation => i.isSigned
                    case _: org.apache.parquet.schema.LogicalTypeAnnotation
                        .DateLogicalTypeAnnotation => true
                    case _ => false
                  })
                if (!signedInt) false
                else {
                val stats = chunk.getStatistics
                if (stats == null || stats.isEmpty) false
                else if (!stats.hasNonNullValue)
                  stats.getNumNulls == block.getRowCount // all-null group ok
                else (asLong(stats.genericGetMin), asLong(stats.genericGetMax)) match {
                  case (Some(lo), Some(hi)) =>
                    local(c) = local(c) match {
                      case Some((l, h)) => Some((math.min(l, lo), math.max(h, hi)))
                      case None => Some((lo, hi))
                    }
                    true
                  case _ => false
                }
                }
            }
          }
        }
        if (ok) Some((rows, local.toMap)) else None
      } finally reader.close()
    }
    try {
      val partials: Seq[Option[(Long, Map[String, Option[(Long, Long)]])]] =
        graft.sources.MetaIO.parallelMap(files)(one)
      if (partials.exists(_.isEmpty)) None
      else {
        val accs = cols.map(_ -> new Acc).toMap
        var rows = 0L
        partials.flatten.foreach { case (r, perCol) =>
          rows += r
          perCol.foreach {
            case (c, Some((lo, hi))) =>
              val a = accs(c)
              a.seen = true
              if (lo < a.lo) a.lo = lo
              if (hi > a.hi) a.hi = hi
            case _ => ()
          }
        }
        Some((accs, rows))
      }
    } catch { case _: Exception => None }
  }

  private def toCatalyst(v: Long, dt: DataType): Any = dt match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType | DateType => v.toInt
    case LongType => v
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      val reqs = aggExprs.map(reqOf)
      val wanted = reqs.flatten
      // at least one min/max (count-only belongs to CountFromMetadataRule's
      // GraftTable scope; plain-parquet count rides along here when mixed)
      if (reqs.exists(_.isEmpty) ||
          !wanted.exists(r => r.isInstanceOf[MinOf] || r.isInstanceOf[MaxOf])) agg
      else ParquetScanScope.of(child) match {
        case Some(sc) if sc.files.nonEmpty =>
          val cols = wanted.collect {
            case MinOf(a) => a.name
            case MaxOf(a) => a.name
          }.distinct
          // a PARTITION column's values come from the directory layout;
          // data files may carry a same-named shadow column (the V2
          // pre-strip append leaves an all-null one) whose footer stats
          // would silently answer min(rev) with the shadow's values
          if (cols.exists(sc.partitionCols.contains)) agg
          else foldStats(sc.files, cols) match {
            case Some((accs, rows)) =>
              val values = wanted.map {
                case MinOf(a) =>
                  val acc = accs(a.name)
                  if (acc.seen) toCatalyst(acc.lo, a.dataType) else null
                case MaxOf(a) =>
                  val acc = accs(a.name)
                  if (acc.seen) toCatalyst(acc.hi, a.dataType) else null
                case CountAll => rows
              }
              LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))
            case None => agg
          }
        case _ => agg
      }
  }
}

object MinMaxFromMetadataRule {
  /** Runtime installation on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MinMaxFromMetadataRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MinMaxFromMetadataRule(spark)
}
