package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Column ⇄ Expression bridge for graft's broadcast-holding expressions.
  *
  * Spark 4 made the classic `Column(expr)` constructor `private[sql]`;
  * expressions without a FunctionRegistry entry (those that must carry a
  * runtime object such as a `Broadcast` handle — see
  * [[graft.plans.BloomContainsBroadcast]]) still need to become Columns.
  * This object lives in the `org.apache.spark.sql` package purely to
  * re-export that capability; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
}
