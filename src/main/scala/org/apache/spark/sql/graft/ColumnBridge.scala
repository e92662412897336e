package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column <-> catalyst Expression conversion `private[sql]`
  * (`classic.ExpressionUtils`). This bridge — a subpackage of
  * `org.apache.spark.sql`, the documented escape hatch for extension
  * libraries — re-exports exactly the two conversions graft's custom
  * codegen'd expressions need. Nothing else from the internal API leaks. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
