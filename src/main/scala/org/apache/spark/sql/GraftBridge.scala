package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal private[sql] bridge so graft's custom Catalyst expressions can
  * be wrapped as public `Column`s (Spark 4's Column is ColumnNode-backed;
  * the Expression↔Column converters live in `classic.ExpressionUtils`,
  * which is private[sql] — same technique used by open-source Spark
  * extension libraries). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp function on an existing session (FunctionRegistry is
    * behind private[sql] SessionState). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Wrap an (already-analyzed) logical plan as a DataFrame —
    * `Dataset.ofRows` is private[sql]; needed to hand graft's custom
    * logical operators (e.g. [[graft.plans.AsOfJoinPlan]]) to the
    * planner. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently attach a planner strategy to an EXISTING session (the
    * withExtensions path only works at session build time). */
  def addStrategy(spark: SparkSession,
                  s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
