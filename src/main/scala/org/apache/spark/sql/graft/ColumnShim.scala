package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 moved Column onto ColumnNode; the classic
  * converter lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]` — this shim lives inside the `org.apache.spark.sql`
  * namespace to re-export the two conversions graft needs.
  */
object ColumnShim {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
