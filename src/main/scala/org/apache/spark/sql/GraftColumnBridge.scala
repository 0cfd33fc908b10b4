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
}
