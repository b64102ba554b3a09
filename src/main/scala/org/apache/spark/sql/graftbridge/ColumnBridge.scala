package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made these converters
  * `private[sql]` (`classic.ExpressionUtils`); a one-file object inside
  * the sql package namespace is the sanctioned pattern for extension
  * libraries that ship custom expressions behind a Column facade.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
