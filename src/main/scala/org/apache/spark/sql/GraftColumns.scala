package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping custom Catalyst expressions as user-facing Columns:
  * `ExpressionUtils` is `private[sql]`, so the conversion lives in this
  * package (same precedent as the TimeSeriesCrossValidator placement). */
object GraftColumns {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-root a DataFrame's (analyzed, so temp-view-free) plan onto another
    * session — used to run a write under an isolated session clone whose
    * conf can be set freely without racing the caller's session
    * (`Dataset.ofRows` is private[sql]). */
  def inSession(session: SparkSession, df: Dataset[Row]): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)

  /** Register a function on an already-running session (`sessionState` is
    * private[sql]); the extensions path covers session construction. */
  def registerFunction(spark: SparkSession,
      descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(descriptor._1, descriptor._2, descriptor._3)
}
