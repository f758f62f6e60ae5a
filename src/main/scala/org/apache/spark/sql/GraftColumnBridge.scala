package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for the engine's custom expressions.
  *
  * Spark 4 moved the public `Column` to a ColumnNode wrapper
  * (`org.apache.spark.sql.internal.ColumnNode`); the conversion helpers
  * (`classic.ExpressionUtils`) are `private[sql]`. Library code that wants
  * to embed a custom catalyst `Expression` in a Column WITHOUT a
  * per-session function-registry round trip (the `call_function` path needs
  * [[graft.plans.GraftExtensions.register]] to have run on the session that
  * analyzes the plan) goes through this one-file shim living in the `sql`
  * package. Used by hot-path primitives ([[graft.functions.TextFunctions.hex60]],
  * `VectorFunctions.dotDec`) that are built in Column space before any
  * session is known.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
