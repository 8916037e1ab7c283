package graft.plans

import graft.operators.Dict
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.optimizer.{CollapseProject, ColumnPruning}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Dictionary-aware aggregation rewrite — the DataFrame-surface analog of
  * DuckDB's aggregate-on-dictionary-codes (and of the reference's
  * name-key indirection, io/sirix/index/name/Names.java:30).
  *
  * Matches an [[Aggregate]] whose grouping keys (or distinct-aggregate
  * arguments) include a string attribute `c` backed by a
  * [[Dict.encode]]-written sibling code column `c__dict` — recognized
  * purely from the code attribute's column metadata, no side catalog —
  * and rewrites:
  *
  *  - grouping on `c`            → grouping on `c__dict` (int32)
  *  - `count(DISTINCT c)`        → `count(DISTINCT c__dict)`
  *  - any other reference to `c` → `element_at(<dict literal>, c__dict+1)`
  *
  * The substitution is value-preserving: codes are a bijection on the
  * dictionary's values with null ↔ null, so equality groups, distinct
  * counts, and even string min/max (codes are assigned in value order,
  * though min/max go through the decode expression, not code order) are
  * unchanged. What changes is the plan: the scan reads one int32 column
  * instead of decoding strings, the aggregate hash map keys on ints, and
  * the group-key strings are reconstituted from a ≤`maxDict`-element
  * literal array AFTER aggregation — per output group, not per input row.
  *
  * After the rewrite the rule re-runs Catalyst's own [[ColumnPruning]] +
  * [[CollapseProject]] on the subtree (the main pruning batch has already
  * run by the time user-provided rules fire), so the now-unreferenced
  * string column actually leaves the scan.
  *
  * Filters rewrite too: `c = 'x'` / `c IN (...)` / `c <=> 'x'` become
  * the same predicate on the code column (a value absent from the
  * dictionary compares against code −1, preserving the false-vs-null
  * three-valued result per row). Combined with the aggregate rewrite,
  * `filter($"dept" === "x").groupBy("city").count()` over a dict table
  * scans no string column at all. Filter rewriting only fires when the
  * code attribute is already in the filter child's output (the
  * filter-on-relation shape pushdown produces) — widening an arbitrary
  * node's output could break arity-sensitive parents like Union.
  *
  * Bails (leaves the plan untouched) when: no code attribute with dict
  * metadata exists on the relation that produced `c`; the chain between
  * aggregate and relation is anything but Project/Filter; or `c` reaches
  * the aggregate through an alias (exprId no longer matches the scan).
  */
case class DictAggRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The code attribute + ordered dictionary for `c`, from the leaf
    * relation that actually produced `c` — in a join, a same-named column
    * of another table must not license the rewrite.
    *
    * The RESOLVED schema's metadata is only a hint: a multi-file scan
    * (history frame, `allRevisions`, plain read of the table root) keeps
    * ONE footer's metadata, but each revision wrote its OWN dictionary —
    * rev 1's `eng=0` can collide with rev 2's `deu=0`, and decoding one
    * revision's codes with another's dictionary is a silent wrong answer.
    * So the rewrite is licensed per FILE: every parquet file backing the
    * scan must carry a dictionary for `c`, and the dictionaries must be
    * prefix-compatible (identical, or stable append-only growth — the
    * `Dict.encode(base=...)` path); the rewrite then decodes through the
    * LONGEST. Any disagreement, unparseable footer, or un-enumerable leaf
    * bails to string keys — correct answers degrade to the ordinary plan,
    * never to a mis-decode. */
  private def dictFor(child: LogicalPlan, c: AttributeReference)
      : Option[(Attribute, Array[String])] =
    child.collectLeaves()
      .find(_.output.exists(_.exprId == c.exprId))
      .flatMap { leaf =>
        leaf.output.find(a =>
            a.dataType == IntegerType &&
              a.metadata.contains(Dict.MetaFor) &&
              a.metadata.getString(Dict.MetaFor) == c.name &&
              a.metadata.contains(Dict.MetaValues))
          .flatMap(a => verifiedDict(leaf, a.name, c.name).map(a -> _))
      }

  /** Per-file (path, length, mtime) triples backing a leaf scan, or None
    * when the leaf's files can't be enumerated (then no rewrite). Covers
    * the same leaf shapes as [[MinMaxFromMetadataRule]]: V1 parquet
    * relations, V2 parquet scans, and graft-temporal snapshot tables. */
  private def filesOf(leaf: LogicalPlan): Option[Seq[(String, Long, Long)]] = leaf match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
            if fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
          Some(fs.location.listFiles(Nil, Nil).flatMap(_.files)
            .map(f => (f.getPath.toString, f.getLen, f.getModificationTime)))
        case _ => None
      }
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: graft.sources.GraftTable if !t.isDeltaLayout =>
          Some(t.resolvedDataPaths.flatMap(d =>
            graft.sources.MetaIO.listDataFileStatus(d, ".parquet")
              .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))))
        case _ => None
      }
    case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      sr.scan match {
        case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          // allFiles, not the pruned listing: a superset check is stricter,
          // and prefix-compatibility makes it pass whenever the table is
          // uniformly encoded
          Some(ps.fileIndex.allFiles()
            .map(s => (s.getPath.toString, s.getLen, s.getModificationTime)))
        case _ => filesOf(sr.relation)
      }
    case _ => None
  }

  /** Per-apply memo for [[verifiedDict]]: one optimizer pass (a
    * FIXED-POINT batch) may probe the same leaf for every matched filter
    * conjunct plus every aggregate candidate, and each probe is a live
    * file LISTING on object storage — pay it once per pass (the
    * [[AggFromStatsRule]] StatsMemo discipline). Thread-local: the rule
    * instance is shared across concurrent queries. */
  private val dictMemo = new ThreadLocal[
      collection.mutable.Map[(LogicalPlan, String, String), Option[Array[String]]]] {
    override def initialValue() = collection.mutable.Map.empty
  }

  /** The verified dictionary for code column `codeCol` across every file
    * of `leaf`, when all per-file dictionaries are prefix-compatible. */
  private def verifiedDict(leaf: LogicalPlan, codeCol: String,
                           strCol: String): Option[Array[String]] =
    dictMemo.get().getOrElseUpdate((leaf, codeCol, strCol),
      verifiedDictUncached(leaf, codeCol, strCol))

  private def verifiedDictUncached(leaf: LogicalPlan, codeCol: String,
                                   strCol: String): Option[Array[String]] =
    filesOf(leaf).filter(_.nonEmpty).flatMap { files =>
      FooterSchemas.sparkSchemasOf(files, spark.sparkContext.hadoopConfiguration)
        .flatMap { schemas =>
          val dicts = schemas.map { s =>
            s.fields.find(_.name == codeCol) match {
              case Some(f) if f.metadata.contains(Dict.MetaFor) &&
                  f.metadata.getString(Dict.MetaFor) == strCol &&
                  f.metadata.contains(Dict.MetaValues) =>
                Some(f.metadata.getStringArray(Dict.MetaValues))
              case _ => None
            }
          }
          if (dicts.exists(_.isEmpty)) None
          else {
            val all = dicts.flatten
            val longest = all.maxBy(_.length)
            if (all.forall(d => longest.startsWith(d))) Some(longest) else None
          }
        }
    }

  /** Re-thread `dc` through the Project/Filter chain down to the relation
    * that outputs it (column pruning dropped it — nothing referenced it
    * before this rewrite). */
  private def inject(p: LogicalPlan, dc: Attribute): Option[LogicalPlan] =
    if (p.outputSet.contains(dc)) Some(p)
    else p match {
      case pr: Project =>
        inject(pr.child, dc).map(n =>
          pr.copy(projectList = pr.projectList :+ dc, child = n))
      case f: Filter => inject(f.child, dc).map(n => f.copy(child = n))
      case _ => None
    }

  /** The code for a dictionary value, or -1 when absent — -1 matches no
    * code, so `dc = -1` reproduces `c = '<absent>'` row-for-row (false on
    * non-null, null on null). Linear scan: dictionaries are ≤4096 entries
    * and this runs once at plan time. */
  private def codeOf(values: Array[String], s: String): Int = {
    var i = 0
    while (i < values.length) { if (values(i) == s) return i; i += 1 }
    -1
  }

  /** Project/Filter-over-one-relation shapes only — a Filter above a
    * Union passes `outputSet`/`dictFor` checks with the FIRST child's
    * exprIds, and rewriting there would apply one table's codes to every
    * child's rows. */
  private def simpleChain(p: LogicalPlan): Boolean = p match {
    case _: Project | _: Filter => simpleChain(p.children.head)
    case leaf if leaf.children.isEmpty => true
    case _ => false
  }

  private def rewriteFilter(f: Filter): Filter = {
    if (!simpleChain(f.child)) return f
    val newCond = f.condition.transformUp {
      // null-ness transfers exactly (code is null iff the string is) —
      // and the main optimizer INFERS IsNotNull conjuncts from equality
      // before this rule runs, which would otherwise pin the string
      // column into the scan all by themselves
      case IsNull(a: AttributeReference) if a.dataType == StringType =>
        dictFor(f.child, a) match {
          case Some((dc, _)) if f.child.outputSet.contains(dc) => IsNull(dc)
          case _ => IsNull(a)
        }
      case IsNotNull(a: AttributeReference) if a.dataType == StringType =>
        dictFor(f.child, a) match {
          case Some((dc, _)) if f.child.outputSet.contains(dc) => IsNotNull(dc)
          case _ => IsNotNull(a)
        }
      case EqualTo(a: AttributeReference, Literal(v, StringType)) if v != null =>
        dictPredicate(f.child, a, v.toString, EqualTo.apply).getOrElse(
          EqualTo(a, Literal(v, StringType)))
      case EqualTo(Literal(v, StringType), a: AttributeReference) if v != null =>
        dictPredicate(f.child, a, v.toString, EqualTo.apply).getOrElse(
          EqualTo(Literal(v, StringType), a))
      case EqualNullSafe(a: AttributeReference, Literal(v, StringType)) if v != null =>
        dictPredicate(f.child, a, v.toString, EqualNullSafe.apply).getOrElse(
          EqualNullSafe(a, Literal(v, StringType)))
      case in @ In(a: AttributeReference, list)
          if a.dataType == StringType && list.nonEmpty && list.forall {
            case Literal(v, StringType) => v != null
            case _ => false
          } =>
        dictFor(f.child, a) match {
          case Some((dc, values)) if f.child.outputSet.contains(dc) =>
            val codes = list.collect { case Literal(v, StringType) =>
              codeOf(values, v.toString)
            }.filter(_ >= 0)
            if (codes.isEmpty) EqualTo(dc, Literal(-1))
            else In(dc, codes.map(Literal(_)))
          case _ => in
        }
    }
    if (newCond fastEquals f.condition) f else Filter(newCond, f.child)
  }

  /** `op(dc, code-literal)` when `a` has a dict whose code attr is in
    * scope; a value absent from the dictionary compares against -1. */
  private def dictPredicate(child: LogicalPlan, a: AttributeReference,
                            s: String,
                            op: (Expression, Expression) => Expression)
      : Option[Expression] =
    if (a.dataType != StringType) None
    else dictFor(child, a) match {
      case Some((dc, values)) if child.outputSet.contains(dc) =>
        Some(op(dc, Literal(codeOf(values, s))))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    dictMemo.get().clear() // fresh files/footers per pass (staleness)
    // filters first: the aggregate rewrite re-runs ColumnPruning, and a
    // still-string-keyed filter below would pin the string column into
    // the pruned scan before its own rewrite got a chance
    val filtered = plan.transform { case f: Filter => rewriteFilter(f) }
    filtered.transform {
      case agg: Aggregate =>
      val grouped = agg.groupingExpressions.collect {
        case a: AttributeReference if a.dataType == StringType => a
      }
      val distincted = agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression if ae.isDistinct =>
          ae.aggregateFunction.children.collect {
            case a: AttributeReference if a.dataType == StringType => a
          }
      }.flatten)
      val candidates = (grouped ++ distincted).distinct
      val out = candidates.foldLeft(agg) { (cur, c) =>
        rewriteOne(cur, c).getOrElse(cur)
      }
      if (out eq agg) agg else CollapseProject(ColumnPruning(out))
    }
  }

  private def rewriteOne(agg: Aggregate, c: AttributeReference): Option[Aggregate] =
    if (!simpleChain(agg.child)) None
    else dictFor(agg.child, c).flatMap { case (dc, values) =>
      inject(agg.child, dc).map { newChild =>
        val decode = ElementAt(
          Literal.create(values.toSeq, ArrayType(StringType)),
          Add(dc, Literal(1)))
        val newGroupings = agg.groupingExpressions.map {
          case a: AttributeReference if a.exprId == c.exprId => dc
          case g => g.transformUp {
            case a: AttributeReference if a.exprId == c.exprId => decode
          }
        }
        val newResults = agg.aggregateExpressions.map { ne =>
          val rewritten = ne match {
            // the grouping key surfacing as output: decode it per GROUP,
            // keeping the original exprId so downstream plans still bind
            case a: AttributeReference if a.exprId == c.exprId =>
              Alias(decode, a.name)(a.exprId, a.qualifier)
            case other => other.transformDown {
              // distinct aggregation distinguishes exactly what codes
              // distinguish — a BARE column argument of a CARDINALITY-ONLY
              // aggregate (count) counts the codes. The bare-code
              // substitution is ONLY valid there: a value-carrying
              // distinct aggregate (collect_list/collect_set/min/max …)
              // would surface int32 codes where the query expects
              // strings. Those — and any reference nested inside an
              // expression (substring(c, ..)) — decode like everywhere
              // else.
              case ae: AggregateExpression if ae.isDistinct &&
                  ae.aggregateFunction.isInstanceOf[
                    org.apache.spark.sql.catalyst.expressions.aggregate.Count] =>
                val af = ae.aggregateFunction
                val newChildren = af.children.map {
                  case a: AttributeReference if a.exprId == c.exprId => dc
                  case child => child.transformUp {
                    case a: AttributeReference if a.exprId == c.exprId => decode
                  }
                }
                ae.copy(aggregateFunction = af.withNewChildren(newChildren)
                  .asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])
              case a: AttributeReference if a.exprId == c.exprId => decode
            }
          }
          rewritten.asInstanceOf[NamedExpression]
        }
        Aggregate(newGroupings, newResults, newChild)
      }
    }
}

object DictAggRule {
  /** Runtime installation on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[DictAggRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DictAggRule(spark)
}
