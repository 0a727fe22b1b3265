package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to the `private[sql]` Column <-> Expression converters (Spark 4's
 * Column wraps a ColumnNode, not an Expression). Lives in the
 * org.apache.spark.sql package solely to widen access for graft's custom
 * Catalyst expressions; no Spark internals are modified.
 */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
