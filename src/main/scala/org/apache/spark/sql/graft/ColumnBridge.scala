package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's Column wraps a ColumnNode (Connect refactor) and the
  * conversion helpers are `private[sql]`, so extension libraries that
  * ship native expressions host this one-liner inside the sql
  * namespace — the same public-API-gap workaround used by open-source
  * Spark extension projects. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
