package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column <-> Expression converters for
  * graft expressions that carry plan REFERENCE OBJECTS
  * ([[graft.functions.TopCells]]: the IVF centroid matrix) and so
  * cannot route through the FunctionRegistry — a registry builder only
  * receives child expressions, which would force model state through a
  * literal (the exact plan/codegen bloat the reference object avoids).
  * Everything else in graft stays registry-routed
  * (graft.functions.VectorFunctions.ensureRegistered). */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
