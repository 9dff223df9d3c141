package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ⇄ catalyst Expression converters —
  * the minimum surface a library needs to expose a custom native
  * Expression through the public Column API (the same technique
  * established Spark extension libraries use). Nothing else from the
  * private API is touched.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
