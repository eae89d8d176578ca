package graft.plans

import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning, PartitioningCollection}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{Cost, CostEvaluator, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.internal.SQLConf

/** AQE skew-join rescue for the fact ⋈ per-key-aggregate join shape —
  * two cooperating pieces, both required:
  *
  *   - [[SkewAggJoinRescue]], an AQE query-stage-preparation rule
  *     (`injectQueryStagePrepRule` via [[GraftExtensions]]) that
  *     re-materializes the aggregate side through a fresh shuffle once
  *     runtime stats prove the join is skewed;
  *   - [[GraftCostEvaluator]], a custom AQE cost model
  *     (`spark.sql.adaptive.customCostEvaluatorClass`) that prices an
  *     UNSPLITTABLE skewed join above the one small shuffle the rescue
  *     adds — without it, AQE's default evaluator (plain un-staged
  *     shuffle count) vetoes the rescued re-plan as "more expensive"
  *     and keeps the pathological plan.
  *
  * Why this exists (measured, `tools/SkewStress` + PLANS.md round-12):
  * Spark's `OptimizeSkewedJoin` pattern-matches a shuffle join whose
  * children read BARE shuffle output — `SMJ(Sort(stage), Sort(stage))`.
  * When one join input is a per-key aggregate — the single most natural
  * skewed-join shape, "fact joined to its own per-key stats" — the
  * aggregate's final `HashAggregate` sits between the Sort and the
  * shuffle, the pattern never matches, and AQE's skew handling silently
  * does not apply AT ANY THRESHOLD. Under a planted 50 %-hot key the
  * hot reducer reads ~32× the median partition while the rest of a
  * 1000-executor cluster idles. SkewStress also proved the cure:
  * pre-materializing the aggregate (so the join reads it through a
  * fresh shuffle) restores the pattern and AQE splits the hot partition
  * (`plain-mat`: aqe_skew_marked flips true). The rule performs that
  * materialization in-plan, automatically, and only when it pays off.
  *
  * Cost model: in the non-skewed case (no materialized input stage over
  * AQE's own thresholds) the rule is a strict no-op — zero extra
  * shuffles, plans byte-identical, and [[GraftCostEvaluator]] orders
  * plans exactly as Spark's `SimpleCostEvaluator` does. In the skewed
  * case the rescue adds ONE shuffle of the aggregate OUTPUT (the small
  * side by construction — |keys| rows; the 100 TB fact side is never
  * re-shuffled) to unlock AQE's split of the hot fact partitions.
  * Semantics are untouched either way: the inserted exchange re-hashes
  * on the exact partitioning the aggregate already satisfies, so it is
  * a pure re-materialization boundary.
  */
object SkewRescueSupport {

  /** Runtime kill-switch (default on). */
  val FLAG = "spark.graft.skewJoin.rescueAggSide"

  /** Conf value for `spark.sql.adaptive.customCostEvaluatorClass`. */
  val EVALUATOR = "graft.plans.GraftCostEvaluator"

  def enabled(conf: SQLConf): Boolean =
    conf.getConf(SQLConf.SKEW_JOIN_ENABLED) &&
      conf.getConfString(FLAG, "true").toBoolean

  def hashPart(p: Partitioning): Option[HashPartitioning] = p match {
    case h: HashPartitioning => Some(h)
    case c: PartitioningCollection =>
      c.partitionings.collectFirst { case h: HashPartitioning => h }
    case _ => None
  }

  /** A final aggregate (possibly under a Project) — the node that, when
    * directly under the join-side Sort (or directly a ShuffledHashJoin
    * child), breaks OptimizeSkewedJoin's Sort-over-bare-stage pattern. */
  def blockingAgg(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case pj: ProjectExec => blockingAgg(pj.child)
    case _ => false
  }

  def stripSort(p: SparkPlan): SparkPlan = p match {
    case SortExec(_, _, c, _) => c
    case other => other
  }

  /** Does any MATERIALIZED shuffle stage under `side` show a partition
    * AQE would call skewed? Mirrors OptimizeSkewedJoin's criteria so the
    * rescue fires exactly when the downstream rule would act on it. */
  def hasSkewedStage(side: SparkPlan, conf: SQLConf): Boolean = {
    val thr = conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_THRESHOLD)
    val factor = conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_FACTOR)
    side.collect {
      case s: ShuffleQueryStageExec if s.isMaterialized => s.mapStats
    }.flatten.exists { ms =>
      val sizes = ms.bytesByPartitionId
      sizes.nonEmpty && {
        val med = math.max(sizes.sorted.apply(sizes.length / 2), 1L)
        sizes.max > med * factor && sizes.max > thr
      }
    }
  }

  /** The rescue trigger: a child blocks OptimizeSkewedJoin's pattern AND
    * runtime stats show a skewed input stage somewhere under the join. */
  def blocked(left: SparkPlan, right: SparkPlan, conf: SQLConf): Boolean =
    (blockingAgg(stripSort(left)) || blockingAgg(stripSort(right))) &&
      (hasSkewedStage(left, conf) || hasSkewedStage(right, conf))
}

/** The preparation rule: inserts the re-materialization exchange under
  * a blocking join child once [[SkewRescueSupport.blocked]] holds.
  * Re-applied at every AQE re-planning step, so by the time the join's
  * input stages have materialized their `MapOutputStatistics` are
  * visible here. Idempotent by shape — once the inserted exchange
  * materializes, the re-planned child is a bare stage and the pattern
  * no longer matches. */
object SkewAggJoinRescue extends Rule[SparkPlan] {
  import SkewRescueSupport._

  /** Insert the rescue exchange under a blocking child; leave every
    * other child untouched. */
  private def rescue(child: SparkPlan): SparkPlan = child match {
    case sort @ SortExec(_, _, inner, _) if blockingAgg(inner) =>
      hashPart(inner.outputPartitioning) match {
        case Some(h) =>
          sort.copy(child = ShuffleExchangeExec(h, inner, ENSURE_REQUIREMENTS))
        case None => child
      }
    // ShuffledHashJoin children carry no Sort
    case agg if blockingAgg(agg) =>
      hashPart(agg.outputPartitioning) match {
        case Some(h) => ShuffleExchangeExec(h, agg, ENSURE_REQUIREMENTS)
        case None => child
      }
    case other => other
  }

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!enabled(conf)) return plan
    plan.transformUp {
      case j: SortMergeJoinExec
          if !j.isSkewJoin && blocked(j.left, j.right, conf) =>
        j.copy(left = rescue(j.left), right = rescue(j.right))
      case j: ShuffledHashJoinExec
          if !j.isSkewJoin && blocked(j.left, j.right, conf) =>
        j.copy(left = rescue(j.left), right = rescue(j.right))
    }
  }
}

/** Plan cost: (number of skew-BLOCKED joins, number of un-staged
  * shuffles). Identical ordering to Spark's `SimpleCostEvaluator`
  * whenever no blocked join exists (the overwhelmingly common case);
  * when one does, a plan that resolves it is cheaper even at +1
  * shuffle — the explicit statement that an unsplittable hot partition
  * (hours of one-reducer tail at 100 TB) costs more than re-shuffling
  * a per-key aggregate (|keys| rows). */
final case class GraftCost(blockedSkewJoins: Long, numShuffles: Long) extends Cost {
  override def compare(that: Cost): Int = that match {
    case GraftCost(b, s) =>
      if (blockedSkewJoins != b) java.lang.Long.compare(blockedSkewJoins, b)
      else java.lang.Long.compare(numShuffles, s)
    case _ =>
      throw new IllegalArgumentException(s"GraftCost vs ${that.getClass.getName}")
  }
}

/** Custom AQE cost evaluator (set `spark.sql.adaptive
  * .customCostEvaluatorClass=graft.plans.GraftCostEvaluator`;
  * instantiated reflectively by `CostEvaluator.instantiate`, hence the
  * public no-arg constructor). Without it the default evaluator counts
  * only un-staged shuffles and rejects [[SkewAggJoinRescue]]'s re-plan
  * (2 shuffles staged + 1 rescue vs 2 staged) — the rescue pair must
  * ship together. */
class GraftCostEvaluator extends CostEvaluator {
  import SkewRescueSupport._

  override def evaluateCost(plan: SparkPlan): Cost = {
    val conf = SQLConf.get
    val shuffles = plan.collect { case s: ShuffleExchangeLike => s }.size.toLong
    val blockedJoins =
      if (!enabled(conf)) 0L
      else plan.collect {
        case j: SortMergeJoinExec
            if !j.isSkewJoin && blocked(j.left, j.right, conf) => j
        case j: ShuffledHashJoinExec
            if !j.isSkewJoin && blocked(j.left, j.right, conf) => j
      }.size.toLong
    GraftCost(blockedJoins, shuffles)
  }
}
