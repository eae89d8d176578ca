package graft

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal
import graft.plans.{AsOfColumnPruning, AsOfFilterPushdown, AsOfJoinPlan, GraftExtensions}
import org.apache.spark.sql.graft.PlanBridge

/** Custom optimizer rules for the custom plan node: a Filter/Project
  * above [[AsOfJoinPlan]] must reach the scans even though Catalyst's
  * built-in pushdown doesn't know the node. */
class PlanRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sides = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.where("event_type = 'purchase'")
      .selectExpr("user_id", "unix_micros(ts) AS t", "event_id AS purchase_id")
    val views = ev.where("event_type = 'view'")
      .selectExpr("user_id AS v_user", "unix_micros(ts) AS v_t",
        "event_id AS view_id", "value AS v_value", "props AS v_props")
    (purchases, views)
  }

  private def parquetScans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    SparkTestSession.collectExec(df) { case s: FileSourceScanExec => s }

  test("left-only filters push through the as-of node into the parquet scan") {
    val (purchases, views) = sides
    val joined = Temporal.asofJoinNative(purchases, views, "user_id", "t", "v_user", "v_t")
      .where(col("purchase_id") > 500L)

    // the rule fires: optimized plan has no Filter above the node, and
    // the left subtree carries one
    val opt = PlanBridge.optimized(joined)
    assert(opt.collectFirst { case f @ Filter(_, _: AsOfJoinPlan) => f }.isEmpty,
      s"filter must not stay above the as-of node:\n$opt")
    val node = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    assert(node.left.collectFirst { case f: Filter => f }.nonEmpty,
      s"pushed filter must be in the left subtree:\n${node.left}")

    // and Catalyst carries it the rest of the way: the purchase-side
    // parquet scan claims a pushed filter on event_id (purchase_id's
    // source column)
    val scanFilters = parquetScans(joined).flatMap(_.metadata.get("PushedFilters"))
    assert(scanFilters.exists(_.contains("GreaterThan(event_id,500)")),
      s"expected event_id pushdown in parquet scans, got: $scanFilters")

    // semantics unchanged vs the composed formulation under the same filter
    val composedViews = views.toDF("user_id", "t", "view_id", "v_value", "v_props")
    val want = Temporal.asofJoin(purchases, composedViews, "user_id", "t")
      .where(col("purchase_id") > 500L)
      .selectExpr("user_id", "purchase_id", "coalesce(view_id, -1) AS view_id")
      .orderBy("user_id", "purchase_id").collect()
    val got = joined
      .selectExpr("user_id", "purchase_id", "coalesce(view_id, -1) AS view_id")
      .orderBy("user_id", "purchase_id").collect()
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("column pruning pushes per-side projects below the node and shrinks the scan") {
    val (purchases, views) = sides
    val slim = Temporal.asofJoinNative(purchases, views, "user_id", "t", "v_user", "v_t")
      .select("user_id", "purchase_id", "view_id") // drops v_value, v_props

    val opt = PlanBridge.optimized(slim)
    val node = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    assert(!node.right.output.map(_.name).contains("v_props"),
      s"right side must be pruned below the node, got ${node.right.output}")

    // the view-side parquet scan must not read `props` (a wide string
    // column — the 100 TB cost is real); `value` is dropped too
    val readCols = parquetScans(slim).flatMap(_.schema.fieldNames).toSet
    assert(!readCols.contains("props"), s"props must be pruned from scans, read: $readCols")

    // results still correct
    assert(slim.count() == purchases.count())
  }

  test("GraftExtensions wires strategy AND both optimizer rules") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val rules = PlanBridge.optimizerRules(ext, spark)
    assert(rules.contains(AsOfFilterPushdown) && rules.contains(AsOfColumnPruning))
    assert(PlanBridge.plannerStrategies(ext, spark).contains(graft.plans.AsOfJoinStrategy))
  }
}
