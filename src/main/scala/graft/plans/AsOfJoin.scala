package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native AS-OF join — the whole-operator custom-plan path of the
  * preference order: a LogicalPlan node, a planner Strategy, and a
  * physical sort-merge zipper, registered either per-session
  * ([[GraftExtensions]] via `spark.sql.extensions`) or at runtime on a
  * live session (`PlanBridge.ensureStrategy`).
  *
  * Semantics (mirrors `graft.operators.Temporal.asofJoin`, the
  * composed union+window formulation that q48 cross-checks against
  * DuckDB's native ASOF JOIN): for each left row, the single most
  * recent right row with the same key and `rightTime <= leftTime`;
  * left rows without one keep null right columns. Null keys and null
  * times never match. Right rows that tie on (key, time) resolve to
  * the last in sort order — callers wanting determinism there should
  * de-duplicate (key, time) on the right first, as q64 does.
  *
  * Scale shape: `requiredChildDistribution` is ClusteredDistribution
  * on the keys — EnsureRequirements inserts one hash exchange per
  * side, or NONE for a side already partitioned by the key (the spec
  * asserts this reuse), and AQE coalesces both sides consistently the
  * same way it does for SortMergeJoin. Within a partition the zipper
  * is a single forward pass holding ONE buffered right row — no
  * per-key group materialization, so a hot key degrades to a longer
  * sorted run, never a cross product or an OOM. This is the plan a
  * 1000-executor run wants: shuffle ≤ once per side, then streaming
  * merge. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; a no-op for every
  * other node, as strategies must be. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the
  * as-of strategy at session build time — the standard deployment
  * path for a cluster. (Runtime registration on an existing session:
  * `PlanBridge.ensureStrategy`.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // the custom node's own optimizer algebra (see AsOfJoinRules) —
    // without these, a Filter/Project above the node never reaches the
    // scans, because Catalyst's built-in rules don't know the node
    ext.injectOptimizerRule(_ => AsOfFilterPushdown)
    ext.injectOptimizerRule(_ => AsOfColumnPruning)
    // AQE skew-join rescue for fact ⋈ per-key-aggregate joins — the
    // shape SkewStress measured OptimizeSkewedJoin can never split
    // (see SkewAggJoinRescue). Re-applied on every AQE re-plan; a
    // strict no-op unless a materialized input stage is skewed by
    // AQE's own thresholds.
    ext.injectQueryStagePrepRule(_ => SkewAggJoinRescue)
    // SQL views over the graft catalog: DDL interception + definition
    // splicing. Injected into the HINTS batch (which precedes the
    // Resolution batch) so graft-view commands are rewritten before
    // ResolveSessionCatalog can reject them as non-session views — see
    // graft.sources.v2.GraftViews.
    ext.injectHintResolutionRule(spark => graft.sources.v2.GraftViewRules(spark))
  }
}

/** Physical sort-merge as-of zipper. Requires children clustered by
  * key and sorted by (key, time) ascending — EnsureRequirements
  * supplies exchanges/sorts exactly as for SortMergeJoin, including
  * skipping the exchange when a child's partitioning already
  * satisfies the distribution. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "left rows with a match"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // rows stream through in left order; both facts let upstream sorts
  // and downstream requirements reuse this node's work
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutput = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val (lKey, rKey, lTime, rTime) = (leftKey, rightKey, leftTime, rightTime)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(Seq(lKey), lOut)
      val rkProj = UnsafeProjection.create(Seq(rKey), rOut)
      val ltProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rtProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // one buffered right row (copied: sort output reuses its buffer)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      def advance(): Unit = rRow = if (rIter.hasNext) rIter.next().copy() else null
      // most recent right row usable for the CURRENT left key, + its key
      var cand: InternalRow = null
      var candKey: InternalRow = null

      lIter.map { l =>
        val lk = lkProj(l) // valid until the next lkProj call
        if (!lk.isNullAt(0)) {
          val lt = ltProj(l)
          if (!lt.isNullAt(0)) {
            var done = false
            while (rRow != null && !done) {
              val rk = rkProj(rRow)
              val c = keyOrd.compare(rk, lk)
              if (c > 0) done = true
              else if (c < 0) { cand = null; candKey = null; advance() }
              else {
                val rt = rtProj(rRow)
                // null right time sorts first within the key group and
                // can never satisfy rt <= lt: consume, don't buffer
                if (rt.isNullAt(0)) advance()
                else if (timeOrd.compare(rt, lt) <= 0) {
                  cand = rRow; candKey = rk.copy(); advance()
                } else done = true
              }
            }
          }
        }
        val matched = cand != null && !lk.isNullAt(0) &&
          keyOrd.compare(candKey, lk) == 0 && !ltProj(l).isNullAt(0) &&
          timeOrd.compare(rtProj(cand), ltProj(l)) <= 0
        numOutput += 1
        if (matched) numMatched += 1
        resultProj(joined(l, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
