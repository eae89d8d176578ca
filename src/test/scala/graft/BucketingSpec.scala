package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** The co-located join property: joining two tables bucketed+sorted on
  * the join key plans with ZERO exchanges — the layout, not the query,
  * pays the shuffle. This is the spec backing Bucketing's 100 TB claim. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"

  test("join of two bucketed tables runs with zero exchanges; unbucketed needs two") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ, not broadcast
    // sort elision: Spark only TRUSTS bucket sortedness behind this flag
    // (multi-file buckets would make it unsafe; writeBucketed guarantees
    // one file per bucket, which is exactly the safe case)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      // baseline: the same join unbucketed shuffles both sides
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      assert(SparkTestSession.shuffles(plain) >= 3, "two join exchanges + one agg exchange")

      Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4)
      val ob = Bucketing.readBucketed(spark, "orders_b")
      val lb = Bucketing.readBucketed(spark, "lineitem_b")
      val joined = ob.join(lb, col("o_orderkey") === col("l_orderkey"))
      // rows identical to the unbucketed join
      assert(joined.count() ==
        orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count())
      // and the join itself is exchange-free AND sort-free: bucket i zips
      // with bucket i, already ordered by the key on disk
      assert(SparkTestSession.shuffles(joined) == 0, "bucketed join must not shuffle")
      val sorts = {
        joined.collect()
        import org.apache.spark.sql.execution.{SortExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def go(p: SparkPlan): Int = p match {
          case a: AdaptiveSparkPlanExec => go(a.executedPlan)
          case q: QueryStageExec => go(q.plan)
          case s: SortExec => 1 + s.children.map(go).sum
          case other => other.children.map(go).sum
        }
        go(org.apache.spark.sql.graft.PlanBridge.executedPlan(joined))
      }
      assert(sorts == 0, "sortBy at write time makes read-side sorts unnecessary")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
