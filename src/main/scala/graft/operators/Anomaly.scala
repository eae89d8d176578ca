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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_value_anomaly" -> ((s, dir) =>
      valueAnomalies(Tables.events(s, dir)).orderBy("event_id"))
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
        |ORDER BY event_id""".stripMargin
  )
}
