package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between catalyst Expressions and the public (node-based, Spark 4)
  * Column API. Lives under org.apache.spark.sql for private[sql] access.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Register an expression builder for SQL use in this session. */
  def registerFunction(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Wrap a (resolved) logical plan as a DataFrame — the construction hook
    * for custom logical operators (e.g. graft.plans.AsofJoin).
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Ensure a planner strategy is active in this session (idempotent) —
    * covers ad-hoc sessions built without GraftExtensions.
    */
  def ensureStrategy(spark: SparkSession, strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.exists(_.getClass == strategy.getClass))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Ensure an optimizer rule is active in this session (idempotent) —
    * same lazy-registration path as [[ensureStrategy]].
    */
  def ensureOptimizerRule(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.exists(_.getClass == rule.getClass))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }
}
