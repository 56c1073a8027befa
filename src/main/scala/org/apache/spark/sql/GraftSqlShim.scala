package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` helpers needed to implement a custom
  * Catalyst `Expression` against the public DataFrame surface: lift an
  * Expression into a Column (and back), and name the `AbstractDataType`
  * type `ExpectsInputTypes` implementations must mention. Lives in the
  * spark.sql package solely to satisfy the scoping; nothing internal is
  * modified. */
object GraftSqlShim {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
