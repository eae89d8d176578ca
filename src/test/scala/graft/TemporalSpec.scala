package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofJoin picks the most recent right row at or before the left time") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "lp")
    val right = Seq((1L, 90L, "v1"), (1L, 150L, "v2"), (1L, 201L, "v3"), (3L, 10L, "vx"))
      .toDF("k", "t", "rp")
    val out = Temporal.asofJoin(left, right, "k", "t")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "p1", "v1"),  // 90 <= 100, not 150
      (1L, "p2", "v2"),  // 150 <= 200, not 201
      (2L, "p3", null))) // no right rows for key 2
  }

  test("asofJoin matches a simultaneous right row (<= not <)") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "lp")
    val right = Seq((1L, 100L, "v")).toDF("k", "t", "rp")
    val out = Temporal.asofJoin(left, right, "k", "t").collect()
    assert(out(0).getString(3) == "v")
  }

  test("native as-of join agrees row-for-row with the composed formulation on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.where("event_type = 'purchase'")
      .selectExpr("user_id", "unix_micros(ts) AS t", "event_id AS purchase_id")
    val v = ev.where("event_type = 'view'")
      .selectExpr("user_id AS vu", "unix_micros(ts) AS vt", "event_id AS view_id")
    val native = Temporal.asofJoinNative(p, v, "user_id", "t", "vu", "vt")
      .selectExpr("user_id", "purchase_id", "coalesce(view_id, -1) AS view_id")
    val composed = Temporal.asofJoin(p,
        v.selectExpr("vu AS user_id", "vt AS t", "view_id"), "user_id", "t")
      .selectExpr("user_id", "purchase_id", "coalesce(view_id, -1) AS view_id")
    assert(native.count() == p.count()) // left join: every purchase kept
    assert(native.exceptAll(composed).count() == 0 &&
           composed.exceptAll(native).count() == 0)
  }

  test("native as-of join: nulls never match, unmatched lefts keep null right columns") {
    val left = Seq((Some(1L), Some(100L), "p1"), (Some(1L), None, "p2"),
        (None, Some(50L), "p3"), (Some(9L), Some(10L), "p4"))
      .toDF("k", "t", "lp")
    val right = Seq((Some(1L), Some(90L), "v1"), (Some(1L), None, "vnull"),
        (None, Some(1L), "vk"))
      .toDF("rk", "rt", "rp")
    val out = Temporal.asofJoinNative(left, right, "k", "t", "rk", "rt")
      .selectExpr("lp", "rp").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("p1" -> "v1", "p2" -> null, "p3" -> null, "p4" -> null))
  }

  test("native as-of join plans one exchange per side and reuses existing partitioning") {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.functions.col
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      SparkTestSession.shuffles(df)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.where("event_type = 'purchase'")
      .selectExpr("user_id", "unix_micros(ts) AS t", "event_id AS purchase_id")
    val v = ev.where("event_type = 'view'")
      .selectExpr("user_id AS vu", "unix_micros(ts) AS vt", "event_id AS view_id")
    val plain = Temporal.asofJoinNative(p, v, "user_id", "t", "vu", "vt")
    assert(exchanges(plain) == 2, "one hash exchange per side")
    // pre-partitioned inputs: the node's ClusteredDistribution is already
    // satisfied, so EnsureRequirements adds NO further exchange — the
    // property that lets a 100TB pipeline pay its shuffle once upstream
    val pPre = p.repartition(4, col("user_id"))
    val vPre = v.repartition(4, col("vu"))
    val pre = Temporal.asofJoinNative(pPre, vPre, "user_id", "t", "vu", "vt")
    assert(exchanges(pre) == 2, "only the two explicit repartitions — none added")
  }

  test("bucketized range join equals the naive range join and plans as an equi-join") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.where("event_type = 'purchase'")
      .selectExpr("event_id AS purchase_id", "unix_micros(ts) AS t")
    val v = ev.where("event_type = 'view'").selectExpr("unix_micros(ts) AS vt")
    val bucketed = Temporal.rangeCountBucketed(p, v, "t", "vt", 600000000L)
      .selectExpr("purchase_id", "n_in_window")
    val naive = p.join(v, col("vt").between(col("t") - 600000000L, col("t")), "left")
      .groupBy("purchase_id").agg(org.apache.spark.sql.functions.count(col("vt")).as("n_in_window"))
    assert(bucketed.exceptAll(naive).count() == 0 && naive.exceptAll(bucketed).count() == 0)
    // purchases with zero views in window are kept (left semantics)
    assert(bucketed.count() == p.count())
    // and the plan is hash/merge join on the bucket id — never nested loop
    bucketed.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def joins(pl: SparkPlan): Seq[String] = pl match {
      case a: AdaptiveSparkPlanExec => joins(a.executedPlan)
      case q: QueryStageExec => joins(q.plan)
      case j: BaseJoinExec => j.nodeName +: j.children.flatMap(joins)
      case other => other.children.flatMap(joins)
    }
    val names = joins(org.apache.spark.sql.graft.PlanBridge.executedPlan(bucketed))
    assert(names.nonEmpty && names.forall(!_.toLowerCase.contains("nestedloop")), names.toString)
  }

  test("GraftExtensions installs the as-of strategy via spark.sql.extensions") {
    import org.apache.spark.sql.graft.PlanBridge
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    assert(PlanBridge.plannerStrategies(ext, spark).contains(graft.plans.AsOfJoinStrategy))
  }

  test("gapFillHourly densifies the hour spine, zero-fills counts, forward-fills values") {
    val hourUs = 3600L * 1000000L
    val ev = Seq(
      ("a", 0L * hourUs, 1.0),
      ("a", 3L * hourUs, 2.5),  // hours 1-2 are gaps for 'a'
      ("b", 1L * hourUs, 4.0))  // hour 0 precedes b's first observation
      .toDF("event_type", "us", "value")
      .selectExpr("event_type", "timestamp_micros(us) AS ts", "value")
    val out = Temporal.gapFillHourly(ev).orderBy("event_type", "h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3).asInstanceOf[Any]))
    assert(out.toSeq == Seq(
      ("a", 0L, 1L, 10000L), // observed
      ("a", 1L, 0L, 10000L), // gap: count 0, value carried forward
      ("a", 2L, 0L, 10000L),
      ("a", 3L, 1L, 25000L),
      ("b", 0L, 0L, null),   // before first observation: NULL, not 0
      ("b", 1L, 1L, 40000L),
      ("b", 2L, 0L, 40000L),
      ("b", 3L, 0L, 40000L)))
  }

  test("trailingAggregates: RANGE frame is inclusive at the width bound and includes equal-time peers") {
    val df = Seq(
      // key 1: t=0, t=3600 (exactly width back from 3600 → 0 IS in frame),
      // t=7201 (0 and 3600 both out of [3601, 7201]... 3600 < 3601 ⇒ out)
      (1L, 0L, 10L), (1L, 3600L, 20L), (1L, 7201L, 40L),
      // key 2: equal-time peers — RANGE frames include ALL peers both ways
      (2L, 100L, 1L), (2L, 100L, 2L))
      .toDF("k", "t", "v")
    val out = Temporal.trailingAggregates(df, "k", "t", "v", 3600L)
      .orderBy("k", "t", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, 10L),
      (1L, 3600L, 2L, 30L),   // frame [0, 3600] — inclusive lower bound
      (1L, 7201L, 1L, 40L),   // frame [3601, 7201] — both earlier rows out
      (2L, 100L, 2L, 3L),     // each peer sees BOTH rows at t=100
      (2L, 100L, 2L, 3L)))
  }
}
