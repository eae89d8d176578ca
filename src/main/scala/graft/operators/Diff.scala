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
}
