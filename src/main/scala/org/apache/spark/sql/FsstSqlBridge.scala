package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression plumbing (Spark 4 removed
  * the public `new Column(expr)` constructor). Standard pattern for Spark
  * extension libraries: one tiny object inside the sql package, nothing
  * else of Spark's internals is touched.
  */
object FsstSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
