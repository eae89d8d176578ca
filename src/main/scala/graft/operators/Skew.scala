package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (at 100 TB one hot key can pin a single reducer for hours while the
  * rest of the cluster idles).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense; salting is the explicit
  * operator form for when the small side can be replicated: the big side
  * gets a per-row salt in [0, s), the small side is exploded to every
  * salt value, and the join key becomes (key, salt) — splitting a hot
  * key across s reducers at the cost of s× the small side. */
object Skew {

  /** Per-row salt for the big side, computed IN-PLAN (no RDD hop): the
    * per-partition row ordinal mod `salt`. `monotonically_increasing_id`
    * is (partitionId << 33) | ordinal-within-partition, so mod `salt` it
    * round-robins every partition's rows — a hot key's rows, EXACT
    * duplicates included, spread evenly across all `salt` sub-keys
    * (content-derived hashes would send identical rows to one reducer,
    * mitigating nothing).
    *
    * Determinism: the ordinal is deterministic iff the input's partition
    * contents and iteration order are — true for file scans and
    * checkpointed frames, the documented precondition. This is the SAME
    * class as `rdd.zipWithIndex` (its per-partition ordinals need the
    * identical assumption; only its cross-partition offsets are pinned
    * by the extra count job, and those are irrelevant mod salt once each
    * partition is round-robined). What the in-plan form buys at scale:
    * no extra count job over the 100 TB side, and no RDD→DataFrame
    * round-trip severing whole-stage codegen and columnar reads —
    * SinksSpec asserts the salted plan stays RDD-free and codegen'd. */
  private[graft] def withSalt(big: DataFrame, salt: Int): DataFrame =
    big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salt.toLong)))

  /** Salted inner equi-join. `big ⋈ small` on `key`, with the big side's
    * rows spread across `salt` sub-keys. Result is row-identical to the
    * plain join (salting only changes the partitioning). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    val bigS = withSalt(big, salt)
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Oracle gate for the salted join: a textbook skew shape — a fact
    * table joined to per-key aggregate stats, where the key (event_type)
    * has a handful of hot values that would each land on one reducer in
    * a plain shuffle join. The salted plan spreads every hot key across
    * 8 sub-keys; the DuckDB twin is the UNSALTED join, so the per-row
    * hash match proves salting is semantically invisible (no lost or
    * duplicated rows — the failure modes of a wrong re-salt). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_salted_join" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir).select("event_id", "event_type")
      val totals = ev.groupBy("event_type")
        .agg(count(lit(1)).as("type_total"))
      saltedJoin(ev, totals, "event_type", salt = 8)
        .select("event_id", "event_type", "type_total")
        .orderBy("event_id")
    }))

  def oracle: Map[String, String] = Map(
    "q104_salted_join" ->
      """SELECT e.event_id, e.event_type, t.type_total
        |FROM events e
        |JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS type_total
        |      FROM events GROUP BY event_type) t USING (event_type)
        |ORDER BY e.event_id""".stripMargin)
}
