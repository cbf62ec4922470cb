package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for wrapping a custom LogicalPlan as a DataFrame.
  *
  * `Dataset.ofRows` is `private[sql]` — the constructor every Spark
  * extension library needs when it exposes a whole-operator API (the
  * DataFrame surface itself offers no "from logical plan" hook). Living
  * in `org.apache.spark.sql` is the standard extension-library idiom for
  * reaching it; nothing else is accessed. */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan

  /** Eager Column → Catalyst Expression conversion. `ExpressionUtils
    * .expression` returns a lazy `ColumnNodeExpression` wrapper that only
    * the classic Dataset entry points unwrap; embedded in a CUSTOM
    * logical node it survives analysis and ships non-serializable
    * internal ColumnNode state into task closures. The converter does
    * the real translation (e.g. internal sort nodes → catalyst
    * SortOrder) up front. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Expression → Column (the reverse direction), for handing custom
    * Catalyst expressions/aggregates straight to the DataFrame API
    * without a function-registry round trip. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
