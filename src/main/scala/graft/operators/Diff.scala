package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — derive a CHANGE DATA FEED from two table versions
  * (the Delta/Iceberg `table_changes` / CDF analog, computed from
  * snapshots when the storage layer didn't record per-commit deltas).
  * The reference's store keeps no history at all
  * (transform_load.py:34-43 overwrites in place); the engine's
  * MVCC-by-immutable-segments store retains generations
  * ([[graft.sources.v2.GraftStore]] time travel), and this operator
  * turns any two of them into the standard four-row-kind change feed:
  *
  *   - key only in `pre`            → one `delete` row (old image)
  *   - key only in `post`           → one `insert` row (new image)
  *   - key in both, payload differs → `update_pre` (old) +
  *                                    `update_post` (new) — the CDC
  *                                    preimage/postimage convention
  *   - key in both, payload equal   → NO row (unchanged rows never
  *                                    leave the join)
  *
  * Scale posture: ONE full-outer shuffle join on the key; unchanged
  * pairs — the overwhelming majority between adjacent versions of a
  * 100 TB table — are dropped by a filter DIRECTLY on the join output,
  * before the pre/post images are built and exploded, so the generate
  * step sees only changed keys. When both snapshots come off the store
  * clustered on the key, the scans report KeyGroupedPartitioning and
  * the join plans with zero pre-join exchanges (the q92 storage-
  * partitioned-join machinery applies verbatim — version generations
  * share the collection's layout). Null-safe comparison (`<=>`) keeps
  * NULL payload transitions (NULL→value, value→NULL) visible as
  * updates rather than collapsing them.
  */
object Diff {

  /** Change rows between `pre` and `post` (same schema, `key` unique in
    * each — snapshot versions of one keyed table). Output: (key,
    * change_type, payload...) with change_type ∈ {insert, delete,
    * update_pre, update_post}. */
  def snapshotDiff(pre: DataFrame, post: DataFrame, key: String): DataFrame = {
    require(pre.columns.sameElements(post.columns),
      s"snapshotDiff: schemas differ: ${pre.columns.mkString(",")} vs ${post.columns.mkString(",")}")
    val payload = pre.columns.filterNot(_ == key).toSeq
    val a = pre.alias("a")
    val b = post.alias("b")
    val joined = a.join(b, col(s"a.$key") === col(s"b.$key"), "full_outer")
    val matched = col(s"a.$key").isNotNull && col(s"b.$key").isNotNull
    val same = payload.map(c => col(s"a.$c") <=> col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    def image(side: String, ct: String): Column =
      struct(lit(ct).as("change_type") +: payload.map(c => col(s"$side.$c").as(c)): _*)
    joined
      .where(!(matched && same)) // unchanged keys exit before the explode
      .select(
        coalesce(col(s"a.$key"), col(s"b.$key")).as(key),
        explode(
          when(col(s"a.$key").isNull, array(image("b", "insert")))
            .when(col(s"b.$key").isNull, array(image("a", "delete")))
            .otherwise(array(image("a", "update_pre"), image("b", "update_post"))))
          .as("__c"))
      .select(col(key) +: col("__c.change_type").as("change_type") +:
        payload.map(c => col(s"__c.$c").as(c)): _*)
  }

  /** Incremental view maintenance for a grouped COUNT/SUM view: apply a
    * [[snapshotDiff]]-shaped change feed onto the view's OLD state
    * instead of re-aggregating the base table — at 100 TB the
    * difference between touching a day's changes and rescanning the
    * world every refresh.
    *
    * `base` is the old aggregate: (`group`, n, v) with n = COUNT(*) and
    * v = SUM(`value`). `changes` carries (change_type, `group`,
    * `value`) rows from the feed; additive deltas make the algebra
    * trivial and TOTAL: insert/update_post contribute +1/+value,
    * delete/update_pre contribute −1/−value, so a row whose GROUP
    * changed is handled with no special casing (its update_pre debits
    * the old group, its update_post credits the new one). Groups
    * born in the delta appear via the full-outer join; groups whose
    * count reaches zero are dropped (a grouped view has no empty
    * groups). COUNT/SUM are self-maintainable; MIN/MAX are not
    * (a deleted extremum needs the base table) — that asymmetry is the
    * standard IVM boundary and is intentionally out of scope here.
    *
    * Cost: one aggregate over the CHANGE FEED (feed-sized, not
    * table-sized) + one join against the group-cardinality-sized view
    * state. Nothing rereads the base table.
    *
    * Preconditions, enforced/documented: a change_type outside the four
    * [[snapshotDiff]] kinds (including NULL) fails the job IN-PLAN via
    * raise_error — a single-row-"update" CDC convention or a typo would
    * otherwise silently debit groups. `value` should be non-null per
    * row: a NULL value contributes 0 to the delta, which matches
    * NULL-ignoring SUM re-aggregation in every case EXCEPT a group
    * whose values are ALL null (recompute says v=NULL, maintained says
    * v=0) — distinguishing that case needs a non-null-count column in
    * the view state, the standard wider IVM state this minimal
    * COUNT/SUM form deliberately omits. */
  def maintainGroupedAgg(base: DataFrame, changes: DataFrame,
      group: String, value: String): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_post"), 1L)
      .when(col("change_type").isin("delete", "update_pre"), -1L)
      .otherwise(raise_error(concat(
        lit("maintainGroupedAgg: unknown change_type (expected insert/"),
        lit("update_pre/update_post/delete): "),
        coalesce(col("change_type"), lit("NULL")))))
    val delta = changes.groupBy(group)
      .agg(sum(sign).as("__dn"), sum(sign * col(value)).as("__dv"))
    base.join(delta, Seq(group), "full_outer")
      .select(col(group),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("v"), lit(0L)) + coalesce(col("__dv"), lit(0L))).cast("long").as("v"))
      .where(col("n") > 0)
  }
}
