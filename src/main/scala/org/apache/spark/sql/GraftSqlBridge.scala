package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported way for libraries to lift custom Catalyst expressions into
  * the public Column API on Spark 4 (classic runtime). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply an extension set's injected functions to a LIVE session's
    * registry (what `SparkSession.applyExtensions` does at build time —
    * needed in tests where getOrCreate reuses an existing session). */
  def registerInjectedFunctions(exts: SparkSessionExtensions, session: SparkSession): Unit =
    exts.registerFunctions(session.sessionState.functionRegistry)
}
