package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made the conversion
  * `private[sql]` (columnNodeSupport.scala), so custom native
  * expressions need this one-hop shim inside the sql package tree —
  * the supported pattern until an injectFunction registration is
  * warranted. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
