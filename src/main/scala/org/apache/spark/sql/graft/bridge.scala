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
    val cs = spark.asInstanceOf[classic.SparkSession]
    // planner.strategies covers built-ins, experimental.extraStrategies AND
    // extension-injected strategies — without the full check, a session
    // built with GraftExtensions would get the strategy registered twice
    if (!cs.sessionState.planner.strategies.exists(_.getClass == strategy.getClass))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
  }

  /** Ensure an optimizer rule is active in this session (idempotent) —
    * same lazy-registration path as [[ensureStrategy]]. Checks both the
    * extension-injected rules and experimental.extraOptimizations so the
    * rule never runs twice per optimization pass.
    */
  def ensureOptimizerRule(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val injected = cs.sessionState.optimizer match {
      case o: org.apache.spark.sql.execution.SparkOptimizer =>
        o.extendedOperatorOptimizationRules.exists(_.getClass == rule.getClass)
      case _ => false
    }
    if (!injected &&
        !cs.experimental.extraOptimizations.exists(_.getClass == rule.getClass))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ rule
  }
}
