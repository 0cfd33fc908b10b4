package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge exposing the classic Column ↔ Expression converters to the graft
  * library — they went `private[sql]` in Spark 4's Connect-era API, and custom
  * Catalyst expressions (e.g. [[graft.functions.CosineSimilarity]]) still need
  * to surface as `Column`s. Lives in Spark's namespace solely for access; the
  * standard pattern for Catalyst extensions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The analyzed logical plan behind a DataFrame — what a table-valued
    * function builder must hand the analyzer (Connect-era `Dataset` hides
    * `queryExecution` behind the classic binding). Analyzed plans are stable
    * under re-analysis, so substituting one mid-resolution is the same move
    * the built-in view resolution makes.
    */
  def analyzedPlan(df: Dataset[Row]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
