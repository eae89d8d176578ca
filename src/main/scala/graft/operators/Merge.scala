package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** MERGE / upsert — the "apply a change batch onto a snapshot" operator
  * (SQL `MERGE INTO`, Delta/Iceberg `merge`, Mongo's per-row
  * `update_one(upsert=True)` loop in the reference —
  * /root/reference/src/transform_load.py:34-43 does exactly this N+1
  * round-trip-per-row; here it is ONE distributed join).
  *
  * Semantics (SCD type 1):
  *   - matched        → target row with same-named columns overwritten
  *                      by the source values ("update")
  *   - source-only    → inserted; target-only columns NULL ("insert")
  *   - target-only    → kept verbatim ("keep")
  *
  * Scale posture: a single full-outer shuffle join on the key — both
  * sides may be arbitrarily large (snapshot 100 TB, change batch TBs).
  * No driver round-trips, no per-row RPCs. When the change batch is
  * small relative to the snapshot the realistic production form adds
  * partition pruning on the target (only rewrite files whose key range
  * intersects the batch — the Delta/Iceberg merge-on-read trick); the
  * join core is the same. The source must be key-unique (the relational
  * MERGE precondition — SQL engines raise on a duplicate match);
  * callers dedup first (q108 uses keep-latest-per-key, the CDC
  * compaction) — `mergeUpsert` asserts it via a loud runtime check on
  * duplicate keys rather than silently picking a winner.
  */
object Merge {

  /** Full-outer MERGE of `source` into `target` on `key`. Columns
    * present in both: source wins on match. Adds `merge_action` ∈
    * {update, insert, keep}. Precondition: `source` key-unique
    * (checked — duplicate source keys raise at execution time, the
    * MERGE cardinality rule). */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val t = target.alias("t")
    // Cardinality guard, in-plan (no extra action): a window count over
    // the source key; >1 ⇒ raise_error. The guard is woven into the KEY
    // column itself — a standalone guard column would be pruned away
    // unevaluated by Catalyst (column pruning removes unused
    // projections), silently disabling the check. Costs one window over
    // the (already key-shuffled) batch.
    val guarded = {
      import org.apache.spark.sql.expressions.Window
      source.withColumn("__kc", count(lit(1)).over(Window.partitionBy(col(key))))
        .withColumn(key,
          when(col("__kc") > 1, raise_error(concat(
            lit(s"mergeUpsert: duplicate source key for '$key': "), col(key).cast("string"))))
          .otherwise(col(key)))
        .drop("__kc")
    }
    val s = guarded.alias("s")
    val joined = t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
    val sCols = source.columns.toSet
    val outCols: Seq[Column] =
      coalesce(col(s"t.$key"), col(s"s.$key")).as(key) +:
      (target.columns.filterNot(_ == key).map { c =>
        if (sCols.contains(c))
          when(col(s"s.$key").isNotNull, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
        else col(s"t.$c").as(c)
      } ++
       source.columns.filterNot(c => c == key || target.columns.contains(c)).map(c =>
         col(s"s.$c").as(c))).toSeq
    val action = when(col(s"t.$key").isNull, lit("insert"))
      .when(col(s"s.$key").isNull, lit("keep"))
      .otherwise(lit("update")).as("merge_action")
    joined.select(outCols :+ action: _*)
  }

  /** q108: CDC-style upsert — the latest event per user (keep-latest
    * compaction via one max(struct) aggregate, the CDC dedup) becomes a
    * balance delta applied onto the `customer` snapshot. Source keys are
    * spread as `user_id*13+7` so every scale factor exercises all three
    * actions (high keys fall outside the snapshot → inserts; low keys
    * match → updates; untouched customers → keeps). Money compares as
    * exact e2/e4 integers, the repo-wide cross-engine convention. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_merge_upsert" -> ((s, dir) => {
      val latest = Tables.events(s, dir)
        .groupBy((col("user_id") * 13 + 7).as("c_custkey"))
        // keep-latest per key: lexicographic max over (ts, event_id,
        // value) — event_id is unique so the order is total and the
        // trailing value rides along
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("c_custkey"),
          round(col("m.value") * 10000).cast("long").as("bal_e4"))
      val snapshot = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal") * 100).cast("long").as("bal_e4_src_is_e2_scaled"))
        // unify scale: snapshot cents ×100 → e4, so updated and kept
        // balances share one integer domain
        .withColumn("bal_e4", col("bal_e4_src_is_e2_scaled") * 100)
        .drop("bal_e4_src_is_e2_scaled")
      mergeUpsert(snapshot, latest, "c_custkey")
        .orderBy("c_custkey")
    }))

  def oracle: Map[String, String] = Map(
    "q108_merge_upsert" ->
      """WITH latest AS (
        |  SELECT user_id * 13 + 7 AS c_custkey,
        |    CAST(ROUND(value * 10000) AS BIGINT) AS bal_e4
        |  FROM (
        |    SELECT user_id, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1),
        |snap AS (
        |  SELECT c_custkey, c_name,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) * 100 AS bal_e4
        |  FROM customer)
        |SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
        |  t.c_name AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.bal_e4 ELSE t.bal_e4 END AS bal_e4,
        |  CASE WHEN t.c_custkey IS NULL THEN 'insert'
        |       WHEN s.c_custkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS merge_action
        |FROM snap t FULL OUTER JOIN latest s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey""".stripMargin)
}
