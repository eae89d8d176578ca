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

  /** Iteration-safe localCheckpoint: materializes like
    * `Dataset.localCheckpoint` but REBUILDS the leaf without the origin
    * statistics Spark's checkpoint normally carries over
    * (`LogicalRDD.fromDataset` copies the optimized plan's stats).
    *
    * Why that carry-over is fatal for deep iterative training: each
    * round's plan joins the previous checkpoint with itself (window →
    * join → window), so SizeInBytesOnlyStatsPlanVisitor MULTIPLIES the
    * carried sizeInBytes — the estimate compounds in magnitude every
    * round, exceeds BigInteger's supported ceiling (2^2^31 bits) after
    * a few dozen rounds, and the driver dies with "BigInteger would
    * overflow supported range" during PLANNING (observed: BPE training
    * at k=64 on sf0.01; the k=6 production path never gets deep
    * enough). Dropping the origin stats resets each round's leaf to
    * defaultSizeInBytes — estimates stay bounded at any depth; the
    * only cost is no auto-broadcast of the checkpointed side
    * (irrelevant for the window-dominated iterative plans that need
    * this). */
  def localCheckpointFreshStats(df: DataFrame): DataFrame = {
    val ds = df.localCheckpoint().asInstanceOf[classic.Dataset[Row]]
    val qe = ds.queryExecution
    val leaf = org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd)(ds.sparkSession)
    classic.Dataset.ofRows(ds.sparkSession, leaf)
  }
}
