package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column <-> catalyst Expression bridge. Spark 4 moved these
  * helpers behind `private[sql]` (`org.apache.spark.sql.classic.
  * ExpressionUtils`); a subpackage of `org.apache.spark.sql` is the
  * sanctioned way for libraries extending Catalyst to reach them — the
  * only non-`graft` package in this repo, kept to two forwarders. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
