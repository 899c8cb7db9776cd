package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column <-> catalyst Expression bridge.
  *
  * Spark 4's public `Column` is Connect-agnostic and no longer exposes
  * `.expr`; the conversion lives in `private[sql]` ExpressionUtils, so
  * this shim sits in the sql package namespace — the same pattern
  * public Spark extension libraries use for Dataset/plan access.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
