package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** stagedDistinct (q112): the two-stage exact distinct must be
  * semantically invisible vs the direct COUNT(DISTINCT), including on a
  * planted hot key, and its stage-1 shuffle must key on the PAIR (that
  * is the whole point — a hot key's members spread across reducers). */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("stagedDistinct equals direct countDistinct with a planted hot key") {
    import org.apache.spark.sql.functions._
    // key 'hot' gets 10k rows over 137 members; cold keys are tiny
    val df = spark.range(10000).selectExpr(
      "IF(id < 9000, 'hot', concat('cold', id % 7)) AS k",
      "IF(id < 9000, id % 137, id % 3) AS m")
    val staged = Skew.stagedDistinct(df, "k", "m")
      .withColumnRenamed("n_m", "n").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val direct = df.groupBy("k").agg(countDistinct("m").as("n")).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(staged.toSeq == direct.toSeq)
    assert(staged.toMap.apply("hot") == 137L)
  }

  test("stage 1 shuffles on the pair, not the key alone") {
    // non-constant key (a literal would constant-fold out of the
    // grouping expressions and defeat the plan-shape assertion)
    val df = spark.range(100).selectExpr("concat('k', id % 3) AS k", "id % 5 AS m")
    val plan = Skew.stagedDistinct(df, "k", "m").queryExecution.optimizedPlan.toString
    // two aggregate stages: the dedup groups by BOTH columns (the
    // pair-keyed shuffle), the count groups by the key alone
    val pairAgg = """Aggregate \[k#\d+L?, m#\d+L?\]""".r
    assert(pairAgg.findFirstIn(plan).isDefined,
      s"expected a pair-keyed Aggregate [k, m] stage in:\n$plan")
    assert(plan.linesIterator.count(_.contains("Aggregate")) >= 2,
      s"expected two aggregate stages in:\n$plan")
  }
}
