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
  /** Cardinality guard, in-plan (no extra action): a window count over
    * the source key; >1 ⇒ raise_error. The guard is woven into the KEY
    * column itself — a standalone guard column would be pruned away
    * unevaluated by Catalyst (column pruning removes unused
    * projections), silently disabling the check. Costs one window over
    * the (already key-shuffled) batch. */
  private def guardUniqueKey(source: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    source.withColumn("__kc", count(lit(1)).over(Window.partitionBy(col(key))))
      .withColumn(key,
        when(col("__kc") > 1, raise_error(concat(
          lit(s"merge: duplicate source key for '$key': "), col(key).cast("string"))))
        .otherwise(col(key)))
      .drop("__kc")
  }

  def mergeUpsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val t = target.alias("t")
    val s = guardUniqueKey(source, key).alias("s")
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

  /** SCD Type-2 MERGE: apply a change batch onto a versioned dimension
    * snapshot, KEEPING HISTORY — the warehouse-dimension counterpart of
    * [[mergeUpsert]]'s overwrite (SCD-1). The reference's upsert loop
    * (transform_load.py:34-43) destroys prior values; a training-data /
    * analytics store that must answer "what was this attribute when the
    * example was sampled?" needs the versioned form.
    *
    * Target rows are the CURRENT versions (caller supplies `valid_from`,
    * micros; `valid_to` open). Per key:
    *   - target-only                → keep (still current)
    *   - matched, `attr` UNCHANGED  → keep (SCD-2 no-ops on equal values
    *                                  — no spurious versions)
    *   - matched, `attr` changed    → TWO rows: the old version closed
    *                                  (`valid_to` = change time,
    *                                  is_current=false) + a new open
    *                                  version starting at the change time
    *   - source-only                → insert (first version; target-only
    *                                  payload columns NULL)
    *
    * Scale posture: ONE full-outer shuffle join on the key (same core
    * as mergeUpsert), then the 1-or-2 output versions per key are built
    * as an in-row array and EXPLODED — never a second pass over the
    * join (a union-of-selects formulation would recompute the join per
    * branch: Catalyst does not share subplans across a Union). Source
    * key-uniqueness is the MERGE precondition, enforced in-plan by the
    * same guard as mergeUpsert. */
  def scdMerge(target: DataFrame, source: DataFrame,
      key: String, attr: String, changeTime: String): DataFrame = {
    val t = target.alias("t")
    val s = guardUniqueKey(source, key).alias("s")
    val joined = t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
    val matched = col(s"t.$key").isNotNull && col(s"s.$key").isNotNull
    val changed = !(col(s"t.$attr") <=> col(s"s.$attr"))
    val carry = target.columns.filterNot(c =>
      c == key || c == attr || c == "valid_from").toSeq
    def version(vf: Column, vt: Column, cur: Column, act: String, a: Column) =
      struct(a.as(attr), vf.as("valid_from"), vt.as("valid_to"),
        cur.as("is_current"), lit(act).as("scd_action"))
    val openTo = lit(null).cast("long")
    val closed = version(col("t.valid_from"), col(s"s.$changeTime"),
      lit(false), "close", col(s"t.$attr"))
    val opened = version(col(s"s.$changeTime"), openTo, lit(true), "version",
      col(s"s.$attr"))
    val kept = version(col("t.valid_from"), openTo, lit(true), "keep",
      col(s"t.$attr"))
    val inserted = version(col(s"s.$changeTime"), openTo, lit(true), "insert",
      col(s"s.$attr"))
    joined.select(
      (coalesce(col(s"t.$key"), col(s"s.$key")).as(key) +:
        carry.map(c => col(s"t.$c").as(c)) :+
        explode(
          when(matched && changed, array(closed, opened))
            .when(col(s"s.$key").isNull || matched, array(kept))
            .otherwise(array(inserted))).as("__v")): _*)
      .select(
        (col(key) +: carry.map(col) :+ col(s"__v.$attr") :+
          col("__v.valid_from") :+ col("__v.valid_to") :+
          col("__v.is_current") :+ col("__v.scd_action")): _*)
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
    }),

    /* q118: SCD Type-2 — the same change feed as q108 (latest event per
     * mapped key, value → balance) applied HISTORICALLY onto the customer
     * snapshot (all rows current since valid_from=0). The key spread
     * (user_id*13+7) again exercises insert/version/keep; a PLANTED
     * no-op slice (keys ≡ 0 mod 97, excluded from the change feed's
     * ≡ 7 mod 13 residue so source stays key-unique) re-submits the
     * CURRENT balance, pinning the "equal value ⇒ no new version" rule
     * the organic data would never hit (event balances virtually never
     * equal snapshot balances). */
    "q118_scd2_merge" -> ((s, dir) =>
      scd2Dim(s, dir).orderBy("c_custkey", "valid_from", "scd_action")),

    // Point-in-time (temporal) join: enrich every event with the
    // dimension version that was CURRENT at the event's own time — the
    // feature-store correctness rule ("what was this attribute when the
    // example was sampled?") and the consumer the q118 SCD-2 dimension
    // exists for. Composed, not new machinery: the versions are an
    // as-of join's right side keyed on valid_from — SCD-2 intervals are
    // contiguous per key (every close has an open successor; a delete
    // would need a tombstone version), so "last version with
    // valid_from <= t" ≡ "the version whose [valid_from, valid_to)
    // contains t". One key shuffle + linear pass, never pairs (q48's
    // plan). The DuckDB twin is the INDEPENDENT interval-containment
    // formulation (t >= valid_from AND t < coalesce(valid_to, inf)), so
    // the hash match cross-proves the two formulations. Events of an
    // insert-only key predate its first version → null payload, the
    // left-join branch, exercised organically at every SF.
    "q126_pit_join" -> ((s, dir) => {
      val dim = scd2Dim(s, dir).select(col("c_custkey"),
        col("valid_from").as("t_us"),
        col("bal_e4").as("bal_at_event"), col("scd_action").as("ver_action"))
      val facts = Tables.events(s, dir).select(
        (col("user_id") * 13 + 7).as("c_custkey"),
        expr("unix_micros(ts)").as("t_us"), col("event_id"))
      Temporal.asofJoin(facts, dim, "c_custkey", "t_us")
        .select("event_id", "c_custkey", "bal_at_event", "ver_action")
        .orderBy("event_id")
    }))

  /** The q118 SCD-2 dimension (unsorted) — the change feed (latest event
    * per mapped key) + planted no-op slice merged historically onto the
    * customer snapshot. Shared by q118 and the q126 point-in-time join. */
  private def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    val latest = Tables.events(s, dir)
      .groupBy((col("user_id") * 13 + 7).as("c_custkey"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("c_custkey"),
        round(col("m.value") * 10000).cast("long").as("bal_e4"),
        expr("unix_micros(m.ts)").as("t_us"))
    val snap = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"),
        (round(col("c_acctbal") * 100).cast("long") * 100).as("bal_e4"),
        lit(0L).as("valid_from"))
    val noop = snap
      .filter(col("c_custkey") % 97 === 0 && col("c_custkey") % 13 =!= 7)
      .select(col("c_custkey"), col("bal_e4"),
        lit(1700000000000000L).as("t_us"))
    scdMerge(snap, latest.unionByName(noop), "c_custkey", "bal_e4", "t_us")
  }

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
        |ORDER BY c_custkey""".stripMargin,

    "q118_scd2_merge" ->
      s"""WITH $scd2Ctes
        |SELECT * FROM ($scd2Union)
        |ORDER BY c_custkey, valid_from, scd_action""".stripMargin,

    // the same SCD-2 dimension as a CTE, consumed by the
    // interval-containment join — the independent twin of the Spark
    // side's as-of forward-fill formulation
    "q126_pit_join" ->
      s"""WITH $scd2Ctes,
        |dim AS ($scd2Union),
        |facts AS (
        |  SELECT event_id, user_id * 13 + 7 AS c_custkey, epoch_us(ts) AS t_us
        |  FROM events)
        |SELECT f.event_id, f.c_custkey,
        |  d.bal_e4 AS bal_at_event, d.scd_action AS ver_action
        |FROM facts f LEFT JOIN dim d
        |  ON f.c_custkey = d.c_custkey AND f.t_us >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.t_us < d.valid_to)
        |ORDER BY event_id""".stripMargin)

  /** DuckDB CTE chain building the q118 change-feed full-outer join
    * (`j`), shared by the q118 gate and the q126 point-in-time join. */
  private val scd2Ctes: String =
    """latest AS (
      |  SELECT user_id * 13 + 7 AS c_custkey,
      |    CAST(ROUND(value * 10000) AS BIGINT) AS bal_e4,
      |    epoch_us(ts) AS t_us
      |  FROM (
      |    SELECT user_id, value, ts,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events)
      |  WHERE rn = 1),
      |snap AS (
      |  SELECT c_custkey, c_name,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) * 100 AS bal_e4
      |  FROM customer),
      |noop AS (
      |  SELECT c_custkey, bal_e4, CAST(1700000000000000 AS BIGINT) AS t_us
      |  FROM snap WHERE c_custkey % 97 = 0 AND c_custkey % 13 <> 7),
      |src AS (SELECT * FROM latest UNION ALL SELECT * FROM noop),
      |j AS (
      |  SELECT t.c_custkey AS tk, t.c_name AS c_name, t.bal_e4 AS old_bal,
      |         s.c_custkey AS sk, s.bal_e4 AS new_bal, s.t_us AS t_us
      |  FROM snap t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey)""".stripMargin

  /** The four SCD-2 action branches over `j` (close/version/keep/insert). */
  private val scd2Union: String =
    """
      |  SELECT tk AS c_custkey, c_name, old_bal AS bal_e4,
      |    CAST(0 AS BIGINT) AS valid_from, t_us AS valid_to,
      |    FALSE AS is_current, 'close' AS scd_action
      |  FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND old_bal <> new_bal
      |  UNION ALL
      |  SELECT tk, c_name, new_bal, t_us, CAST(NULL AS BIGINT),
      |    TRUE, 'version'
      |  FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND old_bal <> new_bal
      |  UNION ALL
      |  SELECT tk, c_name, old_bal, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
      |    TRUE, 'keep'
      |  FROM j WHERE tk IS NOT NULL AND (sk IS NULL OR old_bal = new_bal)
      |  UNION ALL
      |  SELECT sk, CAST(NULL AS VARCHAR), new_bal, t_us, CAST(NULL AS BIGINT),
      |    TRUE, 'insert'
      |  FROM j WHERE tk IS NULL
      |""".stripMargin
}
