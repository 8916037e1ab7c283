package graft.plans

import graft.sources.{DeltaTemporalTable, GraftTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analysis-time rewrite that makes delta-encoded graft tables readable
  * through every declarative surface — `spark.read.format("graft-temporal")`,
  * the [[graft.sources.GraftCatalog]] SQL face (incl. `VERSION AS OF` /
  * `TIMESTAMP AS OF`) — by substituting the relation with its
  * reconstruction plan.
  *
  * The reference reconstructs a delta-versioned page transparently inside
  * the page reader (bundles/sirix-core/src/main/java/io/sirix/settings/
  * VersioningType.java — DIFFERENTIAL/SLIDING_SNAPSHOT combine fragments on
  * every page fault); the Spark analog is this rule: a
  * [[DeltaTemporalTable]] revision is `base full snapshot ∘ (≤ window−1)
  * delta applications`, a chain of key-partitioned anti-join ∪ upsert
  * operators that a V2 `Scan` cannot express but a `LogicalPlan` can.
  * Substituting at ANALYSIS time (not optimization) matters: the
  * reconstruction subtree then flows through the normal optimizer, so
  * filter pushdown, column pruning and AQE all apply to the underlying
  * parquet scans — a predicate on the read lands in every fragment's
  * `PushedFilters`.
  *
  * Output attributes keep the relation's exprIds (name-matched aliases), so
  * references above the rewritten node stay resolved. Idempotent by shape:
  * the rewrite leaves no [[GraftTable]] relation behind.
  */
case class DeltaReconstructRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case rel: DataSourceV2Relation =>
      rel.table match {
        case t: GraftTable if t.isDeltaLayout =>
          val reconstructed =
            (if (t.wantsAllRevisions)
              // full history frame: the bounded event-interval plan,
              // reshaped to the snapshot layout's V2 surface (data
              // columns + `rev` partition column)
              DeltaTemporalTable.readAllRevisions(spark, t.tablePath)
                .drop("commit_ts", "author")
                .withColumnRenamed("revision", "rev")
            else DeltaTemporalTable.read(spark, t.tablePath, t.deltaRevision))
              .queryExecution.analyzed
          val byName = reconstructed.output.map(a => a.name -> a).toMap
          val projections = rel.output.map { a =>
            val src = byName.getOrElse(a.name, throw new IllegalStateException(
              s"delta reconstruction of ${t.tablePath} is missing column ${a.name}"))
            Alias(src, a.name)(exprId = a.exprId)
          }
          Project(projections, reconstructed)
        case _ => rel
      }
  }
}
