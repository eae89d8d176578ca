package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end gate for [[graft.plans.SkewAggJoinRescue]]: the fact ⋈
  * per-key-aggregate shape that SkewStress measured AQE's
  * OptimizeSkewedJoin can NEVER split (the final HashAggregate between
  * the join-side Sort and the shuffle breaks its pattern). With the
  * rescue rule on, AQE must mark the join skewed and split the hot
  * fact partition — with it off, it must not (proving the rule, not
  * Spark alone, restores eligibility) — and the rows must be identical
  * either way (the rescue is a pure re-materialization boundary). */
class SkewRescueSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Key 'hot' owns 80% of fact rows; totals is its per-key aggregate —
    * q104's exact shape, scaled down. */
  private def factAggJoin(): DataFrame = {
    val fact = spark.range(40000).selectExpr(
      "id", "IF(id % 10 < 8, 'hot', concat('k', id % 29)) AS k")
    val totals = fact.groupBy("k").agg(count(lit(1)).as("n"))
    fact.join(totals, Seq("k"))
  }

  /** Tiny thresholds so the planted hot partition trips AQE's own skew
    * criteria at test scale; broadcast off (the rescue targets the
    * non-broadcastable case). */
  private val skewConfs = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1kb")

  private def skewMarked(df: DataFrame): Boolean =
    SparkTestSession.collectExec(df) {
      case j: SortMergeJoinExec if j.isSkewJoin => j
    }.nonEmpty

  test("rescue ON: AQE splits the hot partition of a fact ⋈ aggregate join") {
    withConfs(skewConfs :+
      ("spark.graft.skewJoin.rescueAggSide" -> "true"): _*) {
      val df = factAggJoin()
      val n = df.count()
      assert(n == 40000L)
      assert(skewMarked(df),
        "expected an isSkewJoin=true SortMergeJoin with the rescue rule on")
      // the rescue's signature: a third shuffle (the re-materialized
      // aggregate output) beyond the fact + partial-agg exchanges
      assert(SparkTestSession.shuffles(factAggJoin()) == 3)
    }
  }

  test("rescue OFF: AQE cannot split the same join (the measured gap)") {
    withConfs(skewConfs :+
      ("spark.graft.skewJoin.rescueAggSide" -> "false"): _*) {
      val df = factAggJoin()
      assert(df.count() == 40000L)
      assert(!skewMarked(df),
        "OptimizeSkewedJoin fired without the rescue — its pattern must " +
          "have learned aggregates; retire the rule")
      assert(SparkTestSession.shuffles(factAggJoin()) == 2)
    }
  }

  test("rescued rows are identical to the plain join's") {
    val expected = withConfsResult("false")
    val rescued = withConfsResult("true")
    assert(rescued == expected)
  }

  private def withConfsResult(flag: String): Seq[(Long, String, Long)] = {
    var out: Seq[(Long, String, Long)] = Nil
    withConfs(skewConfs :+ ("spark.graft.skewJoin.rescueAggSide" -> flag): _*) {
      // join on Seq("k") puts the key first: (k, id, n)
      out = factAggJoin().collect()
        .map(r => (r.getLong(1), r.getString(0), r.getLong(2))).toSeq.sorted
    }
    out
  }

  test("no skew, no rescue: the rule is a strict no-op on uniform keys") {
    withConfs(skewConfs :+
      ("spark.graft.skewJoin.rescueAggSide" -> "true"): _*) {
      val fact = spark.range(40000).selectExpr("id", "concat('k', id % 64) AS k")
      val totals = fact.groupBy("k").agg(count(lit(1)).as("n"))
      val df = fact.join(totals, Seq("k"))
      assert(df.count() == 40000L)
      assert(SparkTestSession.shuffles(fact.join(totals, Seq("k"))) == 2,
        "rescue inserted its exchange without a skewed input stage")
    }
  }
}
