package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` classic Column↔Expression converters,
  * needed to expose custom Catalyst expressions through the public Column
  * API (the supported extension route is SparkSessionExtensions; this
  * bridge only avoids forcing users to register functions first). */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Inspect the optimizer rules an extensions object would inject
    * (test-only; buildOptimizerRules is private[sql]). */
  def optimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
                     spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
