package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters so graft's
  * native Catalyst expressions (e.g. [[graft.plans.DotProduct]]) can be
  * exposed as Columns. Standard extension-library pattern: this file lives
  * in the org.apache.spark.sql package tree solely for access. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
