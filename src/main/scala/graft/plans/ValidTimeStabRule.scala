package graft.plans

import graft.operators.Intervals
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Valid-time stab rewrite (SURVEY.md §4.3 item 2 — the reference's
  * `optimizer/walker/json/JsonValidTimeStep.java`, invoked from
  * `optimizer/SirixOptimizer.java:369-375`, turns interval predicates into
  * RI-tree index scans; the Spark analog turns a stab predicate into a
  * fork-node IN-list that partition pruning and row-group skipping serve).
  *
  * Matches a Filter over an [[Intervals.writeIndexed]] table — recognized
  * purely from the `__fork` attribute's column metadata, no side catalog —
  * whose condition contains the stab pattern for instant L:
  *
  * {{{ from <= L  AND  (to > L | OR(isnull(to), to > L)) }}}
  *
  * and conjoins `__fork IN (root-path nodes of L)` (≤64 values) plus the
  * same IN-list on the `__fork_part` hive partition column when present.
  * The added predicate is implied by the original (every interval
  * containing L registers on L's root path), so results are unchanged —
  * but the IN-list reaches the file listing: only the matched fork
  * directories are read, the reference's O(log axis) stab guarantee
  * re-expressed as partition pruning. Semi-joins/overlap windows keep
  * their bucketized plans ([[Intervals.overlapJoin]]); this rule is the
  * point-lookup fast path.
  */
case class ValidTimeStabRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  /** IN-list literals typed to the target attribute (hive partition
    * discovery may have inferred `__fork_part` as int). */
  private def inList(attr: Attribute, nodes: Seq[Long]): Option[Expression] =
    attr.dataType match {
      case LongType => Some(In(attr, nodes.map(Literal(_))))
      case IntegerType if nodes.forall(n => n.isValidInt) =>
        Some(In(attr, nodes.map(n => Literal(n.toInt))))
      case _ => None
    }

  private def longOf(l: Literal): Option[Long] = l.value match {
    case i: Int => Some(i.toLong)
    case i: Long => Some(i)
    case i: Short => Some(i.toLong)
    case _ => None
  }

  /** `from <= L` in either literal position. */
  private def stabLowerBound(e: Expression, from: Attribute): Option[Long] = e match {
    case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(from) => longOf(l)
    case GreaterThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(from) => longOf(l)
    case _ => None
  }

  /** `to > L`, bare or in the null-tolerant `isnull(to) OR to > L` form. */
  private def stabUpperBound(e: Expression, to: Attribute): Option[Long] = e match {
    case GreaterThan(a: Attribute, l: Literal) if a.semanticEquals(to) => longOf(l)
    case LessThan(l: Literal, a: Attribute) if a.semanticEquals(to) => longOf(l)
    case Or(IsNull(a: Attribute), rest) if a.semanticEquals(to) => stabUpperBound(rest, to)
    case Or(rest, IsNull(a: Attribute)) if a.semanticEquals(to) => stabUpperBound(rest, to)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val forkOpt = child.output.find(a =>
        a.name == Intervals.ForkCol && a.metadata.contains(Intervals.MetaFrom))
      forkOpt match {
        // idempotence: skip once the condition already constrains __fork
        case Some(fork) if !cond.references.contains(fork) =>
          val meta = fork.metadata
          val fromName = meta.getString(Intervals.MetaFrom)
          val toName = meta.getString(Intervals.MetaTo)
          val gran = meta.getLong(Intervals.MetaGranularity)
          // resolve from/to ONLY from the relation that carries __fork —
          // in a Filter above a join, another table's same-named columns
          // must not license pruning the indexed side
          val relOutput = child.collectLeaves()
            .find(_.output.exists(_.exprId == fork.exprId))
            .map(_.output).getOrElse(Seq.empty)
          (relOutput.find(_.name == fromName), relOutput.find(_.name == toName)) match {
            case (Some(from), Some(to)) =>
              val conjuncts = splitConjunctivePredicates(cond)
              val lower = conjuncts.flatMap(stabLowerBound(_, from)).headOption
              val upper = conjuncts.flatMap(stabUpperBound(_, to)).headOption
              (lower, upper) match {
                case (Some(l), Some(u)) if l == u && l >= 0 =>
                  val axisMax =
                    if (meta.contains(Intervals.MetaAxisMax))
                      meta.getLong(Intervals.MetaAxisMax)
                    else Long.MaxValue
                  // a stab past the axis max cannot be served by the fork
                  // index: OPEN intervals registered at [from, axisMax]
                  // still contain such instants but their forks are not on
                  // the instant's root path — bail, keep the plain filter
                  if (l / gran > axisMax) f
                  else {
                  val nodes = Intervals.stabNodes(l, gran).filter(_ <= axisMax)
                  if (nodes.isEmpty) f
                  else {
                    val partIn = child.output.find(_.name == Intervals.ForkPartCol)
                      .flatMap(inList(_, nodes))
                    inList(fork, nodes).map { forkIn =>
                      val added = partIn.map(And(forkIn, _)).getOrElse(forkIn)
                      Filter(And(cond, added), child)
                    }.getOrElse(f)
                  }
                  }
                case _ => f
              }
            case _ => f
          }
        case _ => f
      }
  }
}

object ValidTimeStabRule {
  /** Runtime installation on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ValidTimeStabRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ValidTimeStabRule(spark)
}
