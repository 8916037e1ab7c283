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
  * Bails (leaves the plan untouched) when: no code attribute with dict
  * metadata exists on the relation that produced `c`; the chain between
  * aggregate and relation is anything but Project/Filter; or `c` reaches
  * the aggregate through an alias (exprId no longer matches the scan).
  */
case class DictAggRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The code attribute + ordered dictionary for `c`, from the leaf
    * relation that actually produced `c` — in a join, a same-named column
    * of another table must not license the rewrite. */
  private def dictFor(child: LogicalPlan, c: AttributeReference)
      : Option[(Attribute, Array[String])] =
    child.collectLeaves()
      .find(_.output.exists(_.exprId == c.exprId))
      .flatMap(_.output.find(a =>
        a.dataType == IntegerType &&
          a.metadata.contains(Dict.MetaFor) &&
          a.metadata.getString(Dict.MetaFor) == c.name &&
          a.metadata.contains(Dict.MetaValues)))
      .map(a => a -> a.metadata.getStringArray(Dict.MetaValues))

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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
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

  private def rewriteOne(agg: Aggregate, c: AttributeReference): Option[Aggregate] =
    dictFor(agg.child, c).flatMap { case (dc, values) =>
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
              // distinguish — count the codes, never decode
              case ae: AggregateExpression if ae.isDistinct =>
                ae.transformUp {
                  case a: AttributeReference if a.exprId == c.exprId => dc
                }
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
