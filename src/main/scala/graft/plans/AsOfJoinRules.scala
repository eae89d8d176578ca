package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rules ([[org.apache.spark.sql.catalyst.rules.Rule]]
  * via `SparkSessionExtensions.injectOptimizerRule`) for the custom
  * [[AsOfJoinPlan]] node — §2.10's remaining extension category.
  *
  * A custom LogicalPlan is OPAQUE to Catalyst: the built-in
  * PushDownPredicates / ColumnPruning rules only fire on node shapes
  * they know, so a `Filter` parked on top of [[AsOfJoinPlan]] never
  * reaches the parquet scan, and the scan reads every column both
  * sides carry. At 100 TB those are the two levers that decide whether
  * the scan reads gigabytes or terabytes — a custom node therefore
  * ships its own algebra:
  *
  *  - [[AsOfFilterPushdown]]: left-only deterministic conjuncts move
  *    into the left child (sound because the join is LEFT-preserving,
  *    exactly 1 output row per left row, and left attributes pass
  *    through unchanged). Right-side conjuncts must NOT move — an
  *    unmatched left row nulls the right columns, so a right filter
  *    below the join would change which rows match, not just drop
  *    output rows.
  *  - [[AsOfColumnPruning]]: a Project consuming a subset of the
  *    join's output pushes per-side Projects below the node (keeping
  *    each side's key/time, which the merge itself needs). Once below,
  *    Catalyst's own rules carry the pruning into the scans.
  *
  * Both rules are fixed-point-safe: they fire only when they change
  * the plan, and the rewritten shape no longer matches. */
object AsOfFilterPushdown extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (push, keep) = splitConjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfColumnPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, aj: AsOfJoinPlan)
        if (AttributeSet(aj.output) -- p.references
          -- AttributeSet(Seq(aj.leftKey, aj.rightKey, aj.leftTime, aj.rightTime))).nonEmpty =>
      val needed = p.references ++
        AttributeSet(Seq(aj.leftKey, aj.rightKey, aj.leftTime, aj.rightTime))
      def prune(side: LogicalPlan): LogicalPlan =
        if (side.output.forall(needed.contains)) side
        else Project(side.output.filter(needed.contains), side)
      p.copy(child = aj.copy(left = prune(aj.left), right = prune(aj.right)))
  }
}
