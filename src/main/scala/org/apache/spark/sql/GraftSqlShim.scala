package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to two `private[sql]` seams of the public Spark distribution that
  * SQL-DML translation needs (the same seams other open table formats sit
  * on): building a DataFrame from an analyzed LogicalPlan, and wrapping a
  * catalyst Expression as a user-facing Column. Nothing else from the
  * private surface is touched.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eagerly converts the whole column-node tree (the ExpressionUtils
    * variant wraps lazily, which a FunctionRegistry builder cannot use —
    * the analyzer would see unconverted ColumnNodeExpression wrappers).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
