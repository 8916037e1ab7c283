package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, BinaryComparison, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, NamedExpression, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
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
  * snapshot; attribute-only Projects allowed — same scope discipline as
  * [[MinMaxFromMetadataRule]]) whose scan directories all carry FRESH
  * sidecars, and replaces the subtree with a one-row LocalRelation: zero
  * tasks, zero data bytes, at any table size.
  *
  * It also folds GROUPED and FILTERED aggregates from recorded group
  * sections — the micro-cube serving path (Druid/Pinot's aggregate
  * index; the reference's index summaries). A section records the
  * complete value list of a column tuple (a full groupBy over the same
  * pinned file set, recorded only under the
  * [[graft.sources.StatsSidecar.MaxGroupValues]] cardinality bound).
  * Any aggregate whose grouping attributes AND filter columns all lie
  * inside one recorded tuple is answered by evaluating the predicate
  * over the ≤4096 recorded entries driver-side and merging the
  * survivors by grouping value: extra tuple dimensions merge away
  * additively, and a tuple column's own count/sum/min/max within an
  * entry is the exact function of (group value, row count). Supported
  * filter conjuncts: bare/negated boolean attributes, IS [NOT] NULL,
  * `=`/`<=>`/IN against literals, and integral range comparisons
  * (string ranges excluded — token order need not match Spark's UTF8
  * binary collation).
  *
  * `count(distinct c)` folds from sections when `c` is ITSELF a tuple
  * column: a section's entries are the COMPLETE value list of the
  * tuple, so the distinct surviving tokens of `c` — unioned across
  * dirs and/or within each output group — are exactly the distinct
  * values of `c` in the selected rows. This is NOT the (refused)
  * additive merge of per-dir table-level NDVs: token sets union, they
  * never add, so overlap between dirs cannot double-count. An NDV
  * column outside every covering tuple still disables the fold.
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

  /** Per-[[apply]] memo of fresh-sidecar lookups: one optimizer pass may
    * visit several Aggregate nodes and each probes both the global and
    * the section serving path — the same directory must pay its probe and
    * freshness listing at most once per pass. Deliberately NOT cached
    * across passes: a later pass must re-check freshness (appends between
    * queries must degrade the fold to the scan — `q_stats_stale` pins
    * this). Sidecar ABSENCE is additionally negative-cached across
    * queries inside [[StatsSidecar.read]]. */
  private type StatsMemo = collection.mutable.Map[String, Option[StatsSidecar.TableStats]]

  /** Fresh sidecar for `dir`, or None (absent / unparseable / stale). The
    * freshness listing uses the writer's own listing function, so the
    * compared file sets are defined identically on both sides. */
  private def freshStats(dir: String, memo: StatsMemo): Option[StatsSidecar.TableStats] =
    memo.getOrElseUpdate(dir, StatsSidecar.read(dir).filter { st =>
      try {
        val dirUri = graft.sources.MetaIO.fs(dir)
          .makeQualified(new org.apache.hadoop.fs.Path(dir)).toString
        val prefix = if (dirUri.endsWith("/")) dirUri else dirUri + "/"
        val current = graft.sources.MetaIO.listDataFileStatus(dir, ".parquet").map { s =>
          (s.getPath.toString.stripPrefix(prefix), s.getLen, s.getModificationTime)
        }
        StatsSidecar.fresh(st, current)
      } catch { case _: Exception => false }
    })

  private val Exact = 1L << 53

  private def toCatalyst(v: Long, dt: DataType): Any = dt match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType => v.toInt
    case LongType => v
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // cheap tree-pattern bail: most plans carry no Aggregate at all, and
    // this rule must cost zero FS work (and zero tree walk) on them
    if (!plan.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.AGGREGATE))
      return plan
    val memo: StatsMemo = collection.mutable.Map.empty
    plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if aggExprs.nonEmpty &&
            groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
        val groupAttrs = groupExprs.map(_.asInstanceOf[AttributeReference])
        val global =
          if (groupExprs.isEmpty) serveGlobal(agg, aggExprs, child, memo) else None
        global
          .orElse(serveFromSections(agg, groupAttrs, aggExprs, child, memo))
          .getOrElse(agg)
    }
  }

  /** Ungrouped, unfiltered: fold from the table-level statistics. */
  private def serveGlobal(agg: Aggregate, aggExprs: Seq[NamedExpression],
                          child: LogicalPlan, memo: StatsMemo): Option[LogicalPlan] = {
    val reqs = aggExprs.map(reqOf)
    if (reqs.exists(_.isEmpty)) return None
    val dirs = statsDirsOf(child).getOrElse(return None)
    if (dirs.isEmpty) return None
    val wanted = reqs.flatten
    if (wanted.exists(_.isInstanceOf[NdvOf]) && dirs.size > 1)
      return None // NDV is not additive
    val perDir = dirs.map(freshStats(_, memo))
    if (perDir.exists(_.isEmpty)) return None
    serve(wanted, perDir.flatten).map(values =>
      LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
  }

  /** A grouped-aggregate output column: a pass-through of one of the
    * grouping attributes, or a foldable aggregate over a non-group
    * column. */
  private sealed trait GOut
  private case class GroupPass(a: AttributeReference) extends GOut
  private case class GroupAgg(req: Req) extends GOut

  private def groupTokenToCatalyst(tok: Option[String], dt: DataType): Option[Any] =
    tok match {
      case None => Some(null)
      case Some(s) => dt match {
        case StringType =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        case BooleanType => Some(s.toBoolean)
        case ByteType | ShortType | IntegerType | LongType =>
          try Some(toCatalyst(s.toLong, dt)) catch { case _: Exception => None }
        case _ => None
      }
    }

  /** Split a conjunction into its conjuncts. */
  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case x => Seq(x)
  }

  /** Compile one filter conjunct into (referenced column, token
    * predicate), or None when the shape is unsupported. Token predicates
    * implement SQL three-valued semantics against the recorded group
    * tokens: a NULL group value (None) satisfies only IS NULL and a
    * null-safe equality with null. Range comparisons are integral-only —
    * string ordering on tokens would not match Spark's UTF8 binary
    * collation for every input. */
  private def compilePred(e: Expression): Option[(String, Option[String] => Boolean)] = {
    def litLong(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    def supported(a: AttributeReference): Boolean =
      integral(a.dataType) || a.dataType == StringType || a.dataType == BooleanType
    def eqTo(a: AttributeReference, v: Any): Option[(String, Option[String] => Boolean)] =
      if (!supported(a)) None
      else if (v == null) Some(a.name -> ((_: Option[String]) => false))
      else a.dataType match {
        case StringType => Some(a.name -> ((t: Option[String]) => t.contains(v.toString)))
        case BooleanType => Some(a.name -> ((t: Option[String]) => t.contains(v.toString)))
        case _ => litLong(v).map(lv =>
          a.name -> ((t: Option[String]) => t.exists(_.toLong == lv)))
      }
    def cmp(a: AttributeReference, v: Any, op: (Long, Long) => Boolean)
        : Option[(String, Option[String] => Boolean)] =
      if (v == null) Some(a.name -> ((_: Option[String]) => false))
      else if (!integral(a.dataType)) None
      else litLong(v).map(lv =>
        a.name -> ((t: Option[String]) => t.exists(s => op(s.toLong, lv))))
    e match {
      case a: AttributeReference if a.dataType == BooleanType =>
        Some(a.name -> (_.contains("true")))
      case Not(a: AttributeReference) if a.dataType == BooleanType =>
        Some(a.name -> (_.contains("false")))
      case IsNull(a: AttributeReference) => Some(a.name -> (_.isEmpty))
      case IsNotNull(a: AttributeReference) => Some(a.name -> (_.nonEmpty))
      case EqualTo(a: AttributeReference, Literal(v, _)) => eqTo(a, v)
      case EqualTo(Literal(v, _), a: AttributeReference) => eqTo(a, v)
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
        if (v == null) Some(a.name -> (_.isEmpty)) else eqTo(a, v)
      case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
        if (v == null) Some(a.name -> (_.isEmpty)) else eqTo(a, v)
      case GreaterThan(a: AttributeReference, Literal(v, _)) => cmp(a, v, _ > _)
      case GreaterThan(Literal(v, _), a: AttributeReference) => cmp(a, v, _ < _)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmp(a, v, _ >= _)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmp(a, v, _ <= _)
      case LessThan(a: AttributeReference, Literal(v, _)) => cmp(a, v, _ < _)
      case LessThan(Literal(v, _), a: AttributeReference) => cmp(a, v, _ > _)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmp(a, v, _ <= _)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmp(a, v, _ >= _)
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        val preds = list.map(l => eqTo(a, l.asInstanceOf[Literal].value))
        if (preds.exists(_.isEmpty)) None
        else {
          val fns = preds.flatten.map(_._2)
          Some(a.name -> ((t: Option[String]) => fns.exists(_(t))))
        }
      // general negation with SQL three-valued semantics: for inners that
      // can evaluate to NULL (comparisons, IN, bare boolean), NOT(NULL)
      // is NULL and the row is excluded — so a null token stays excluded
      // under negation; only the never-null inners invert directly.
      // negated comparison/IN against a NULL literal first: the inner is
      // TRUE or NULL, never FALSE (a null element poisons IN; a null
      // comparand poisons =,<,>,…), so the negation admits NO row. The
      // generic inversion below would compile it as "non-null and not
      // matched" — a silently inflated fold. EqualNullSafe is excluded
      // (never-null, inverts correctly below).
      case Not(inner @ (_: BinaryComparison | _: In))
          if !inner.isInstanceOf[EqualNullSafe] &&
            inner.children.exists {
              case Literal(null, _) => true; case _ => false
            } =>
        inner.references.toSeq match {
          case Seq(a: AttributeReference) =>
            Some(a.name -> ((_: Option[String]) => false))
          case _ => None
        }
      case Not(inner) => compilePred(inner).map { case (n, fn) =>
        inner match {
          case _: IsNull | _: IsNotNull | _: EqualNullSafe =>
            n -> ((t: Option[String]) => !fn(t))
          case _ =>
            n -> ((t: Option[String]) => t.nonEmpty && !fn(t))
        }
      }
      case _ => None
    }
  }

  /** Synthesize [[StatsSidecar.ColStats]] for a TUPLE column of one
    * entry: within the entry the column is the constant group value, so
    * count/sum/min/max are exact functions of (token, rows). A
    * non-numeric token yields no sum/min/max — harmless, because
    * [[reqOf]] only admits those aggregates on integral attributes. A
    * multiplication overflow yields sum=None with count>0, which the
    * fold helpers treat as poison (bail to the scan). */
  private def synthTupleCol(name: String, tok: Option[String], rows: Long)
      : StatsSidecar.ColStats = tok match {
    case None => StatsSidecar.ColStats(name, 0L, rows, None, None, None)
    case Some(t) =>
      val asLong = try Some(t.toLong) catch { case _: Exception => None }
      val sum = asLong.flatMap { v =>
        try Some(Math.multiplyExact(v, rows)) catch { case _: ArithmeticException => None }
      }
      StatsSidecar.ColStats(name, rows, 0L, sum, asLong.map(v => (v, v)), None)
  }

  /** Serve a (possibly filtered, possibly grouped) aggregate from a
    * recorded group section that COVERS it: a tuple whose column set
    * contains every grouping attribute and every filter column. The
    * section's value list is complete under the cardinality bound, so
    * evaluating the predicate over its ≤[[StatsSidecar.MaxGroupValues]]
    * entries and merging the survivors by the (projected) grouping value
    * is the exact answer — the micro-cube serving path. Extra tuple
    * dimensions merge away additively; per-dir sections may record the
    * covering tuple in different column orders. */
  private def serveFromSections(agg: Aggregate, groupAttrs: Seq[AttributeReference],
                                aggExprs: Seq[NamedExpression],
                                child0: LogicalPlan, memo: StatsMemo): Option[LogicalPlan] = try {
    // peel attribute-only projects, collecting filter conjuncts
    def peel(p: LogicalPlan, conj: Seq[Expression]): (Seq[Expression], LogicalPlan) =
      p match {
        case Project(pl, c) if pl.forall(_.isInstanceOf[Attribute]) => peel(c, conj)
        case f: Filter => peel(f.child, conj ++ splitAnd(f.condition))
        case other => (conj, other)
      }
    val (conjuncts, core) = peel(child0, Nil)
    val preds = conjuncts.map(compilePred)
    if (preds.exists(_.isEmpty)) return None
    val predicates = preds.flatten

    val groupIds = groupAttrs.map(_.exprId).toSet
    val outs: Seq[Option[GOut]] = aggExprs.map {
      case a: AttributeReference if groupIds.contains(a.exprId) => Some(GroupPass(a))
      case Alias(a: AttributeReference, _) if groupIds.contains(a.exprId) =>
        Some(GroupPass(a))
      case ne => reqOf(ne) match {
        case Some(r) => Some(GroupAgg(r))
        case None => None
      }
    }
    if (outs.exists(_.isEmpty)) return None
    // count(distinct c) serves from a section two ways (class scaladoc):
    // token-set union when c is inside the covering tuple (preferred —
    // always valid), or the recorded per-group NDV when section entries
    // map 1:1 to output groups. Covering selection therefore PREFERS a
    // tuple containing the NDV columns but does not require one.
    val ndvCols = outs.flatten.collect { case GroupAgg(NdvOf(a)) => a.name }.distinct

    val needed = (groupAttrs.map(_.name) ++ predicates.map(_._1)).distinct
    if (needed.isEmpty && ndvCols.isEmpty)
      return None // pure global shape — serveGlobal's job
    val dirs = statsDirsOf(core).getOrElse(return None)
    if (dirs.isEmpty) return None
    val perDir = dirs.map(freshStats(_, memo))
    if (perDir.exists(_.isEmpty)) return None

    // per dir: the smallest recorded tuple covering the needed columns
    // (deterministic tie-break), its entries filtered by the predicates
    // and projected to (grouping value, per-column stats incl. the
    // synthesized tuple columns, NDV-column tokens)
    val coverings = Seq.newBuilder[Seq[String]]
    val perDirSurvivors: Seq[Seq[(Seq[Option[String]], Long,
        Map[String, StatsSidecar.ColStats], Map[String, Option[String]])]] =
      perDir.flatten.map { st =>
        val candidates = st.groups.keys.toSeq
          .filter(g => needed.forall(g.contains))
        val covering = candidates.filter(g => ndvCols.forall(g.contains))
          .sortBy(g => (g.size, g.mkString(","))).headOption
          .orElse(candidates.sortBy(g => (g.size, g.mkString(","))).headOption)
          .getOrElse(return None)
        coverings += covering
        val entries = st.groups(covering)
        val predIdx = predicates.map { case (n, fn) => (covering.indexOf(n), fn) }
        val groupIdx = groupAttrs.map(a => covering.indexOf(a.name))
        val ndvIdx = ndvCols.map(n => n -> covering.indexOf(n)).filter(_._2 >= 0)
        entries.flatMap { e =>
          if (!predIdx.forall { case (i, fn) => fn(e.value(i)) }) None
          else {
            val synth = covering.zipWithIndex.map { case (n, i) =>
              n -> synthTupleCol(n, e.value(i), e.rows)
            }.toMap
            Some((groupIdx.map(e.value), e.rows, e.cols ++ synth,
              ndvIdx.map { case (n, i) => n -> e.value(i) }.toMap))
          }
        }
      }

    // merge across dirs (and away over extra tuple dimensions) by the
    // projected grouping value: rows add, per-column stats concat for the
    // shared fold helpers, NDV token sets UNION (never add)
    val merged = collection.mutable.LinkedHashMap
      .empty[Seq[Option[String]], (Long, Map[String, Seq[StatsSidecar.ColStats]],
        Map[String, Set[Option[String]]])]
    perDirSurvivors.foreach(_.foreach { case (value, eRows, eCols, eNdv) =>
      val (r0, c0, n0) = merged.getOrElse(value,
        (0L, Map.empty[String, Seq[StatsSidecar.ColStats]],
          Map.empty[String, Set[Option[String]]]))
      val c1 = eCols.foldLeft(c0) { case (m, (n, cs)) =>
        m + (n -> (m.getOrElse(n, Seq.empty) :+ cs))
      }
      val n1 = eNdv.foldLeft(n0) { case (m, (n, tok)) =>
        m + (n -> (m.getOrElse(n, Set.empty) + tok))
      }
      merged(value) = (r0 + eRows, c1, n1)
    })
    // an ungrouped filtered aggregate returns exactly one row even when
    // nothing survives the filter — the empty fold (0 / NULL) is correct
    if (groupAttrs.isEmpty && merged.isEmpty)
      merged(Seq.empty) = (0L, Map.empty, Map.empty)

    // per-entry recorded NDVs are usable only when every output group is
    // exactly one section entry: one directory, and the covering tuple IS
    // the grouping set (distinct tuple values = distinct groups; filters
    // only drop whole entries). Any merge — extra tuple dimensions or a
    // second dir — makes per-group NDVs non-additive, so the fold bails.
    val coveringSeq = coverings.result()
    val entriesAreGroups = coveringSeq.size == 1 &&
      coveringSeq.head.toSet == groupAttrs.map(_.name).toSet

    val rows = merged.toSeq.map { case (value, (gRows, colMap, ndvSets)) =>
      val byPos = groupAttrs.map(_.name).zip(value).toMap
      val cells = outs.flatten.map {
        case GroupPass(a) => groupTokenToCatalyst(byPos(a.name), a.dataType)
        case GroupAgg(NdvOf(a)) =>
          // token union is exact only when EVERY contributing dir's
          // covering tuple carries the column — a dir whose covering
          // lacks it contributed zero tokens (its ndvIdx filter dropped
          // the column), so exists() would serve a silent undercount on
          // mixed coverings (e.g. one revision's wide tuple exceeded the
          // write-time cardinality bound). Mixed → fall through / bail.
          if (coveringSeq.nonEmpty && coveringSeq.forall(_.contains(a.name)))
            // distinct non-NULL tokens of a tuple column among the
            // surviving entries — exact by section completeness
            Some(ndvSets.getOrElse(a.name, Set.empty).flatten.size.toLong)
          else if (entriesAreGroups) colMap.get(a.name) match {
            // exactly one contributing entry per group (guaranteed
            // above) — its recorded per-group NDV is the exact answer
            case Some(Seq(single)) => single.ndv.map(identity[Any])
            case _ => None
          }
          else None
        case GroupAgg(req) =>
          // a column absent from a dir's section means the column is not
          // in that dir's file schema — its scan rows are null there, so
          // folding over the dirs that DO record it is exact (null-
          // ignoring aggregate semantics); the all-dirs-absent case folds
          // to the correct empty answer (count 0, null sum/min/max)
          def cs(name: String): Seq[StatsSidecar.ColStats] =
            colMap.getOrElse(name, Seq.empty)
          req match {
            case CountStar => Some(gRows)
            case CountCol(a) => Some(cs(a.name).map(_.count).sum)
            case SumOf(a) => foldSum(cs(a.name))
            case AvgOf(a) => foldAvg(cs(a.name))
            case MinOf(a) => foldMin(cs(a.name), a.dataType)
            case MaxOf(a) => foldMax(cs(a.name), a.dataType)
            case _ => None
          }
      }
      if (cells.exists(_.isEmpty)) return None
      InternalRow.fromSeq(cells.map(_.get))
    }
    Some(LocalRelation(agg.output, rows))
  } catch { case scala.util.control.NonFatal(_) => None }

  // ---- shared per-column folds (global and per-group). Each returns
  // None when a needed statistic is unrecorded (→ caller must not
  // rewrite) and Some(null) for the empty/all-null SQL answer. ----

  private def foldSum(cs: Seq[StatsSidecar.ColStats]): Option[Any] =
    if (cs.exists(c => c.sum.isEmpty && c.count > 0)) None // no stat
    else {
      val nonNull = cs.map(_.count).sum
      if (nonNull == 0) Some(null)
      else Some(cs.flatMap(_.sum).sum: java.lang.Long)
    }

  private def foldAvg(cs: Seq[StatsSidecar.ColStats]): Option[Any] =
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

  private def foldMin(cs: Seq[StatsSidecar.ColStats], dt: DataType): Option[Any] =
    if (cs.exists(c => c.minMax.isEmpty && c.count > 0)) None
    else {
      val mms = cs.flatMap(_.minMax)
      if (mms.isEmpty) Some(null)
      else Some(toCatalyst(mms.map(_._1).min, dt))
    }

  private def foldMax(cs: Seq[StatsSidecar.ColStats], dt: DataType): Option[Any] =
    if (cs.exists(c => c.minMax.isEmpty && c.count > 0)) None
    else {
      val mms = cs.flatMap(_.minMax)
      if (mms.isEmpty) Some(null)
      else Some(toCatalyst(mms.map(_._2).max, dt))
    }

  /** Fold the merged answer for each request; None = some statistic is
    * unavailable (column missing from a sidecar, sum overflow guard, …)
    * → caller must not rewrite. */
  private def serve(wanted: Seq[Req], stats: Seq[StatsSidecar.TableStats])
      : Option[Seq[Any]] = {
    val rows = stats.map(_.rows).sum
    // Schema evolution: a dir whose sidecar lacks the column predates it
    // (the sidecar records every data column and its fingerprint covers
    // the file set, so absence-from-sidecar = absence-from-data), and a
    // union-schema read serves NULL there — exactly an all-null ColStats
    // (count 0, no sum/min-max). The fold helpers already treat that as a
    // clean zero contribution, so sum/avg/count/min/max merge correctly
    // across an evolved history instead of bailing. NDV still bails via
    // its ndv=None (and the multi-dir refusal above). A column absent
    // from EVERY sidecar is not evolution — it is a scan-provided column
    // (`rev` partition axis, V2 metadata) whose values no sidecar
    // describes → bail to the scan.
    def col(name: String): Option[Seq[StatsSidecar.ColStats]] = {
      val per = stats.map(_.cols.get(name))
      if (per.forall(_.isEmpty)) None
      else Some(stats.zip(per).map { case (t, c) =>
        c.getOrElse(StatsSidecar.ColStats(name, 0L, t.rows, None, None, None))
      })
    }
    val out = wanted.map {
      case CountStar => Some(rows)
      case CountCol(a) => col(a.name).map(cs => cs.map(_.count).sum)
      case NdvOf(a) => // single-dir only (enforced by caller)
        col(a.name).flatMap(_.head.ndv)
      case SumOf(a) => col(a.name).flatMap(foldSum)
      case AvgOf(a) => col(a.name).flatMap(foldAvg)
      case MinOf(a) => col(a.name).flatMap(foldMin(_, a.dataType))
      case MaxOf(a) => col(a.name).flatMap(foldMax(_, a.dataType))
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
