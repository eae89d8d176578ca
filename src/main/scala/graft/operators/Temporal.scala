package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal joins. Spark has no ASOF JOIN operator; per the preference
  * order (compose built-ins > custom Expression > custom SparkPlan) it
  * is composed here from union + window:
  *
  *   tag right rows 0 / left rows 1 → union → one window partitioned by
  *   key, ordered by (time, tag) → `last(right_payload, ignoreNulls)`
  *   carries the most recent right row forward → keep left rows.
  *
  * Cost: ONE shuffle on the key (the same exchange a native as-of join
  * would need) and a linear in-partition pass — this is the sort-merge
  * formulation, it never builds pairs, so heavy key skew degrades to a
  * sort, not a cross product. The DuckDB oracle uses its native
  * ASOF JOIN, so q48 cross-checks this composition against an
  * independent native implementation. */
object Temporal {

  /** Left as-of join: for each left row, the most recent right row with
    * `rightTime <= leftTime` on the same key. Right payload columns come
    * back null when no prior right row exists.
    *
    * @param left  (key, time, leftPayload...)
    * @param right (key, time, rightPayload...)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == key || c == time)
    val leftPayload = left.columns.filterNot(c => c == key || c == time)
    val l = left.withColumn("__tag", lit(1))
      .select(Seq(col(key), col(time), col("__tag")) ++
        leftPayload.map(col) ++ rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.withColumn("__tag", lit(0))
      .select(Seq(col(key), col(time), col("__tag")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ rightPayload.map(col): _*)
    // same timestamp ⇒ right row sorts first (tag 0) so it matches `<=`
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(Seq(col(key), col(time), col("__tag")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.where(col("__tag") === 1).drop("__tag")
  }

  /** Native as-of join through the custom plan node
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]) —
    * same contract as [[asofJoin]], but planned as a first-class
    * operator: one ClusteredDistribution shuffle per side (elided when
    * a side is already partitioned by the key), then a streaming
    * single-buffered-row merge per partition. q64 runs THIS path
    * against the same DuckDB ASOF oracle that checks the composed q48,
    * so both formulations are independently verified.
    *
    * Distinct left/right column names are the caller's job (the node
    * outputs both sides verbatim); every right column is re-aliased
    * internally so self-joins (both sides reading one source) can't
    * collide on attribute ids. */
  def asofJoinNative(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    val spark = left.sparkSession
    PlanBridge.ensureStrategy(spark, graft.plans.AsOfJoinStrategy)
    PlanBridge.ensureOptimizerRule(spark, graft.plans.AsOfFilterPushdown)
    PlanBridge.ensureOptimizerRule(spark, graft.plans.AsOfColumnPruning)
    // fresh exprIds for the whole right side (alias-to-same-name) — the
    // custom node gets none of the analyzer's join deduplication
    val r = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(r)
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"asofJoinNative: no column '$n'"))
    PlanBridge.ofRows(spark, graft.plans.AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }

  /** Pure range join (NO equi key): for each left row, aggregate right
    * rows whose time falls in [leftTime − window, leftTime].
    *
    * Spark plans a range-only condition as BroadcastNestedLoopJoin —
    * quadratic work and a driver-sized build side, the canonical
    * scale-killer. This decomposes the range into fixed-width buckets
    * (width = the window): a right row lives in exactly one bucket, a
    * left row's interval spans at most two, so exploding the left side
    * to its ≤ 2 candidate buckets turns the whole thing into an
    * EQUI-join on bucket id + a residual range filter. One shuffle per
    * side, pair work linear in true matches per bucket; a time-skewed
    * hot bucket is AQE's skew-split case, not a cross product. */
  def rangeCountBucketed(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String, windowMicros: Long): DataFrame = {
    val probes = left.withColumn("__bks",
      array_distinct(array(
        expr(s"($leftTime - $windowMicros) div $windowMicros"),
        expr(s"$leftTime div $windowMicros"))))
      .withColumn("__bk", explode(col("__bks"))).drop("__bks")
    val buckets = right.withColumn("__bk", expr(s"$rightTime div $windowMicros"))
    probes.join(buckets, Seq("__bk"), "left")
      .withColumn(rightTime, when(
        col(rightTime).between(col(leftTime) - windowMicros, col(leftTime)),
        col(rightTime)))
      .groupBy(left.columns.map(col): _*)
      .agg(count(col(rightTime)).as("n_in_window"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For each purchase, the most recent prior (or simultaneous) view by
    // the same user.
    "q48_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where("event_type = 'purchase'")
        .selectExpr("user_id", "unix_micros(ts) AS t", "event_id AS purchase_id")
      val views = ev.where("event_type = 'view'")
        .selectExpr("user_id", "unix_micros(ts) AS t", "event_id AS view_id")
      asofJoin(purchases, views, "user_id", "t")
        .selectExpr("user_id", "purchase_id", "coalesce(view_id, -1) AS view_id")
        .orderBy("user_id", "purchase_id")
    }),

    // Same question as q48 through the NATIVE custom-plan path; the
    // identical oracle makes the two implementations check each other.
    "q64_asof_native" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where("event_type = 'purchase'")
        .selectExpr("user_id", "unix_micros(ts) AS t", "event_id AS purchase_id")
      val views = ev.where("event_type = 'view'")
        .selectExpr("user_id AS v_user", "unix_micros(ts) AS v_t", "event_id AS view_id")
      asofJoinNative(purchases, views, "user_id", "t", "v_user", "v_t")
        .selectExpr("user_id", "purchase_id", "coalesce(view_id, -1) AS view_id")
        .orderBy("user_id", "purchase_id")
    }),

    // Pure range join: views (ANY user) in the 10 minutes before each
    // purchase — no equi key, so naive Spark would nested-loop it.
    "q70_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where("event_type = 'purchase'")
        .selectExpr("event_id AS purchase_id", "unix_micros(ts) AS t")
      val views = ev.where("event_type = 'view'")
        .selectExpr("unix_micros(ts) AS vt")
      rangeCountBucketed(purchases, views, "t", "vt", 600000000L)
        .selectExpr("purchase_id", "n_in_window AS n_views")
        .orderBy("purchase_id")
    }),

    // Trailing time-window aggregates (RANGE frame): per user, the
    // count and exact value sum of that user's events in the trailing
    // hour INCLUDING the current event — the rate-limit / trailing-
    // feature shape (events-per-user-per-hour, rolling spend). q16's
    // running totals are a ROWS frame; this is the RANGE-frame class,
    // where the window is defined by the ORDER-BY VALUE distance, so
    // ties (equal timestamps) are peers and enter each other's frames
    // in BOTH engines — the semantics are deterministic without a
    // tiebreak column.
    //
    // Scale posture: ONE shuffle on user_id, then Spark's WindowExec
    // evaluates the moving frame with a sliding lower bound over each
    // sorted partition (linear, never per-row rescans the frame). This
    // is the declarative answer to the same question q70 solves for the
    // NO-equi-key case with bucketized self-joins; with a key, a self
    // range-join would shuffle twice and build pairs ∝ matches — the
    // window form never materializes pairs at all.
    "q117_rolling_window" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .selectExpr("event_id", "user_id", "unix_micros(ts) AS t",
          "cast(round(value * 10000) as long) AS v_e4")
      trailingAggregates(ev, "user_id", "t", "v_e4", 3600000000L)
        .selectExpr("event_id", "user_id", "n_win AS n_1h", "sum_win AS sum_e4_1h")
        .orderBy("user_id", "event_id")
    }),

    // Time-series gap fill + forward fill: a dense hourly spine per
    // event_type (missing hours appear with n_events=0) and the hourly
    // value sum carried forward across gaps (`last(..., ignoreNulls)`
    // over an ordered window; NULL before a series' first observation).
    // The downsample-then-densify shape every metrics/feature pipeline
    // needs before feeding models that assume regular sampling.
    //
    // Scale posture: the raw scan collapses to per-(type, hour) partial
    // aggregates FIRST (one shuffle, map-side combined), so spine size
    // is types × hours — calendar-bounded, UNRELATED to raw event
    // volume; the spine explode(sequence) generates in-executor (no
    // driver loop) and the fill window runs per type over already-tiny
    // partitions. Hours are integer epoch-hour buckets (unix_micros div
    // 3600e6) so both engines bucket identically with no tz arithmetic.
    "q113_gap_fill" -> ((s, dir) =>
      gapFillHourly(Tables.events(s, dir)).orderBy("event_type", "h"))
  )

  /** Trailing-window aggregates over a RANGE frame: for each row, the
    * count and sum of `valueCol` across the same key's rows whose
    * `timeMicros` lies in `[t − widthMicros, t]` (inclusive both ends;
    * equal-time peers are in each other's frames — RANGE semantics).
    * Adds `n_win` / `sum_win`. See the q117 registration note for the
    * scale rationale. */
  def trailingAggregates(df: DataFrame, key: String, timeMicros: String,
      valueCol: String, widthMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(timeMicros))
      .rangeBetween(-widthMicros, 0)
    df.withColumn("n_win", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_win", sum(col(valueCol)).over(w).cast("long"))
  }

  /** Dense hourly spine per event_type with zero-filled counts and a
    * forward-filled value sum — see the q113 registration note above
    * for the scale rationale. Input needs (event_type, ts, value). */
  def gapFillHourly(ev: DataFrame): DataFrame = {
    // ONE scan of the raw events: the calendar bounds and the type list
    // both derive from the (types × hours)-sized hourly aggregate, which
    // is cached — at 100 TB that frame is catalog-scale while the raw
    // table is not, so re-reading events three times (hourly/bounds/
    // types) would triple the dominant cost for nothing.
    val hourly = ev
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS h",
        "cast(round(value * 10000) as long) AS v")
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("n_events"), sum("v").cast("long").as("value_e4"))
      .cache()
    val bounds = hourly.agg(min("h").as("h_lo"), max("h").as("h_hi"))
    val spine = hourly.select("event_type").distinct()
      .join(broadcast(bounds))
      .selectExpr("event_type", "explode(sequence(h_lo, h_hi)) AS h")
    val w = Window.partitionBy("event_type").orderBy("h")
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("value_e4"), ignoreNulls = true).over(w).as("filled_value_e4"))
  }

  def oracle: Map[String, String] = Map(
    "q48_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id AS purchase_id FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id AS view_id FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.purchase_id, coalesce(v.view_id, -1) AS view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.t <= p.t
        |ORDER BY p.user_id, purchase_id""".stripMargin,
    "q64_asof_native" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id AS purchase_id FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id AS view_id FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.purchase_id, coalesce(v.view_id, -1) AS view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.t <= p.t
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    "q70_range_join" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT epoch_us(ts) AS vt FROM events WHERE event_type = 'view')
        |SELECT p.purchase_id, count(v.vt) AS n_views
        |FROM p LEFT JOIN v ON v.vt BETWEEN p.t - 600000000 AND p.t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q117_rolling_window" ->
      """SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(v_e4) OVER w AS BIGINT) AS sum_e4_1h
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS t,
        |        CAST(ROUND(value * 10000) AS BIGINT) AS v_e4 FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY t
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q113_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT MIN(epoch_us(ts)) // 3600000000 AS h_lo,
        |         MAX(epoch_us(ts)) // 3600000000 AS h_hi
        |  FROM events),
        |spine AS (
        |  SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(range(h_lo, h_hi + 1)) AS h FROM bounds) g)
        |SELECT s.event_type AS event_type, s.h AS h,
        |  COALESCE(hourly.n_events, 0) AS n_events,
        |  last_value(hourly.value_e4 IGNORE NULLS)
        |    OVER (PARTITION BY s.event_type ORDER BY s.h) AS filled_value_e4
        |FROM spine s LEFT JOIN hourly
        |  ON s.event_type = hourly.event_type AND s.h = hourly.h
        |ORDER BY s.event_type, s.h""".stripMargin
  )
}
