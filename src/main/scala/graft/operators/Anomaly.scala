package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistical outlier detection over the event stream — the data-quality
  * tripwire of an ingestion pipeline (a malfunctioning source shifts its
  * value distribution long before it breaks a schema).
  *
  * The z-score test is run in EXACT integer arithmetic: with per-group
  * n, S = Σx, Q = Σx² over integer cents,
  *
  *   |x − μ| > z·σ  ⇔  (n·x − S)²·(n−1) > z²·n·(n·Q − S²)
  *
  * (sample variance, both sides multiplied by n²·(n−1)). Sums of
  * integers are shuffle-order-independent and the comparison never
  * touches a float, so the flag — unlike any stddev-of-doubles
  * formulation — is deterministic across engines, partitionings, and
  * runs, and therefore DuckDB-oracle-checkable (the twin uses HUGEINT;
  * Spark side uses decimal(38,0) — intermediates reach ~10²⁵, past
  * int64 but well inside 38 digits).
  *
  * Scale shape: one partial-agg groupBy over a handful of event types,
  * a broadcast-sized stats frame joined back, then a narrow filter —
  * the same two-pass shape at 100 TB, with no window over the raw
  * stream. */
object Anomaly {

  /** Per-type moment sums (n, Σx, Σx²) over integer cents — the model
    * side of the detector. A handful of rows; broadcast-sized. */
  def stats(events: DataFrame): DataFrame =
    centsOf(events).groupBy("event_type").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum("x").as("s"),
      sum(expr("x * x")).as("q"))

  /** Score events against a (possibly frozen) stats frame. Works
    * identically on a batch frame and a STREAMING frame — the join is
    * stream-static (equi on event_type) and the filter is stateless, so
    * online scoring IS the batch operator applied to a stream
    * (StreamingSpec proves flag-for-flag equality). */
  def flagAgainst(events: DataFrame, stats: DataFrame, z: Int = 3): DataFrame =
    centsOf(events).join(stats, "event_type")
      .where(s"(n * x - s) * (n * x - s) * (n - 1) > ${z * z} * n * (n * q - s * s)")
      .selectExpr("event_id", "event_type", "cast(x as bigint) AS value_cents")

  /** Events whose value deviates more than `z` sample standard
    * deviations from their event_type's mean. */
  def valueAnomalies(events: DataFrame, z: Int = 3): DataFrame =
    flagAgainst(events, stats(events), z)

  private def centsOf(events: DataFrame): DataFrame =
    events.selectExpr(
      "event_id", "event_type",
      "cast(round(value * 100) as decimal(38,0)) AS x")

  /** Population Stability Index (q145) — the standard distribution-drift
    * score between the OLDER and NEWER half of the event stream (split
    * at the midpoint of the time range, integer micros): bucket `value`
    * into `nb` equal-width integer-cents bins (the q109 binning), count
    * per (bucket, half), and PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with
    * add-one smoothing so empty buckets stay defined. Per-bucket
    * contributions round to e9 BEFORE the sum (the BM25 convention), so
    * the total is summation-order independent and cross-engine exact.
    *
    * Scale shape: one stats pass (column-pruned min/max of cents+ts,
    * 1-row broadcast), then ONE conditional aggregate by bucket — the
    * windows that assemble totals and the final score run over `nb`
    * rows, never the stream. Same two-pass profile at 100 TB. */
  def psiDrift(events: DataFrame, nb: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nb > 1)
    val c = events.selectExpr(
      "cast(round(value * 100) as bigint) AS cents",
      "unix_micros(ts) AS us")
    val bounds = c.agg(min("cents").as("lo"), max("cents").as("hi"),
      expr("(min(us) + max(us)) div 2").as("mid"))
    val perBucket = c.join(broadcast(bounds))
      .withColumn("bucket",
        expr(s"least((cents - lo) * $nb div (hi - lo + 1), ${nb - 1}L)"))
      .groupBy("bucket")
      .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("n_b"))
    val all = Window.partitionBy(lit(1)) // nb rows by construction
    perBucket
      .withColumn("tot_a", sum("n_a").over(all))
      .withColumn("tot_b", sum("n_b").over(all))
      .withColumn("psi_e9", expr(s"""cast(round(1e9 *
        ((n_a + 1) / cast(tot_a + $nb as double) - (n_b + 1) / cast(tot_b + $nb as double)) *
        ln(((n_a + 1) / cast(tot_a + $nb as double)) / ((n_b + 1) / cast(tot_b + $nb as double)))) as bigint)"""))
      .withColumn("psi_total_e9", sum("psi_e9").over(all).cast("long"))
      .select("bucket", "n_a", "n_b", "psi_e9", "psi_total_e9")
      .orderBy("bucket")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_value_anomaly" -> ((s, dir) =>
      valueAnomalies(Tables.events(s, dir)).orderBy("event_id")),

    // Distribution drift between stream halves, oracle-exact through
    // ln() via e9 per-bucket rounding.
    "q145_psi_drift" -> ((s, dir) => psiDrift(Tables.events(s, dir)))
  )

  def oracle: Map[String, String] = Map(
    "q68_value_anomaly" ->
      """WITH c AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS HUGEINT) AS x FROM events),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sm, sum(x * x) AS q
        |  FROM c GROUP BY 1)
        |SELECT event_id, c.event_type, CAST(x AS BIGINT) AS value_cents
        |FROM c JOIN s USING (event_type)
        |WHERE (n * x - sm) * (n * x - sm) * (n - 1) > 9 * n * (n * q - sm * sm)
        |ORDER BY event_id""".stripMargin,

    "q145_psi_drift" ->
      """WITH c AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents, epoch_us(ts) AS us FROM events),
        |b AS (
        |  SELECT MIN(cents) AS lo, MAX(cents) AS hi, (MIN(us) + MAX(us)) // 2 AS mid FROM c),
        |g AS (
        |  SELECT least((cents - lo) * 10 // (hi - lo + 1), 9) AS bucket,
        |    CASE WHEN us < mid THEN 1 ELSE 0 END AS ia
        |  FROM c, b),
        |a AS (
        |  SELECT bucket, CAST(SUM(ia) AS BIGINT) AS n_a, CAST(SUM(1 - ia) AS BIGINT) AS n_b
        |  FROM g GROUP BY bucket),
        |t AS (
        |  SELECT *, CAST(SUM(n_a) OVER () AS BIGINT) AS tot_a,
        |    CAST(SUM(n_b) OVER () AS BIGINT) AS tot_b FROM a),
        |p AS (
        |  SELECT bucket, n_a, n_b,
        |    CAST(round(1e9 *
        |      ((n_a + 1) / CAST(tot_a + 10 AS DOUBLE) - (n_b + 1) / CAST(tot_b + 10 AS DOUBLE)) *
        |      ln(((n_a + 1) / CAST(tot_a + 10 AS DOUBLE)) / ((n_b + 1) / CAST(tot_b + 10 AS DOUBLE)))) AS BIGINT) AS psi_e9
        |  FROM t)
        |SELECT bucket, n_a, n_b, psi_e9, CAST(SUM(psi_e9) OVER () AS BIGINT) AS psi_total_e9
        |FROM p ORDER BY bucket""".stripMargin
  )
}
