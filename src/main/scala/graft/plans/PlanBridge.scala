package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** LogicalPlan ⇄ Dataset bridge for graft's custom plan nodes.
  *
  * Spark 4 seals `Dataset.ofRows` and `queryExecution` behind
  * `private[sql]`, so a library defining its own LogicalPlan node (as
  * the preference order's option (c) requires) needs one object inside
  * the `org.apache.spark.sql` namespace to construct a DataFrame from
  * that node and to inspect the planned result. Companion to
  * [[ColumnBridge]] (which does the same for Expressions); these two
  * objects are the only places graft touches Spark-private API. */
object PlanBridge {

  /** DataFrame from a custom logical plan (runs the full analyzer/
    * optimizer/planner pipeline, so injected strategies apply). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (stable attribute ids). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Final physical plan — used by specs asserting exchange counts. */
  def executedPlan(df: DataFrame): SparkPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.executedPlan

  /** Idempotently add a strategy to an ALREADY-RUNNING session.
    *
    * `spark.sql.extensions` is read once at session construction; the
    * driver's Verify/Bench sessions are built without it, so library
    * entry points self-register here instead — same mechanism
    * (`ExperimentalMethods` feeds the planner alongside injected
    * strategies), no session restart. */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Idempotently add an optimizer rule to an already-running session —
    * the runtime twin of `injectOptimizerRule` (same reason as
    * [[ensureStrategy]]: the driver's sessions are built without
    * `spark.sql.extensions`). `ExperimentalMethods.extraOptimizations`
    * run as their own batch inside the optimizer. */
  def ensureOptimizerRule(spark: SparkSession,
                          rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }

  /** Optimized logical plan — used by specs asserting rule rewrites. */
  def optimized(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.optimizedPlan

  /** The optimizer rules an extensions config would install (spec twin
    * of [[plannerStrategies]]). */
  def optimizerRules(ext: SparkSessionExtensions, spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  /** The planner strategies an extensions config would install — lets a
    * spec prove `spark.sql.extensions=graft.plans.GraftExtensions`
    * wires the same strategy object without needing a fresh JVM-wide
    * session. */
  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession): Seq[SparkStrategy] =
    ext.buildPlannerStrategies(spark)
}
