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
  * key across s reducers at the cost of s× the small side.
  *
  * When AQE is NOT enough (measured, tools/SkewStress + PLANS.md
  * round-12): `OptimizeSkewedJoin` pattern-matches a sort-merge join
  * whose Sorts wrap BARE shuffle reads. A fact ⋈ per-key-aggregate join
  * — the most natural skewed shape, q104's — interposes the aggregate's
  * final HashAggregate between the Sort and the shuffle on the small
  * side, so the rule silently never applies, at ANY threshold; under a
  * planted 50%-hot key the hot reducer reads 32× the median partition.
  * Salting bounds it regardless of plan shape (measured max reducer
  * 1.15M vs 4.03M rows, max/median task time 1.5× vs 6.5–30×). */
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
  /** Exact distinct-count per HOT key, explicitly staged: stage 1
    * shuffles on the (key, member) PAIR — so a hot key's members spread
    * over every reducer instead of pinning one — and dedups; stage 2
    * counts the now-unique pairs per key (tiny). This is the manual form
    * of what Catalyst's distinct-aggregate rewrite does via Expand; it
    * is spelled out as an operator because at 100 TB it composes with
    * pre-aggregation tricks the rewrite can't do (e.g. sketch the pairs,
    * or reuse a pre-bucketed layout on the pair key to elide stage 1's
    * shuffle entirely). Correctness is oracle-checked against the plain
    * COUNT(DISTINCT) — staging must be semantically invisible. */
  def stagedDistinct(df: DataFrame, key: String, member: String): DataFrame = {
    val pairs = df.select(col(key), col(member)).distinct() // pair-keyed shuffle
    pairs.groupBy(key).agg(count(lit(1)).cast("long").as(s"n_$member"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_skew_distinct" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      stagedDistinct(ev, "event_type", "user_id")
        .withColumnRenamed("n_user_id", "n_users")
        .join(ev.groupBy("event_type").agg(count(lit(1)).as("n_events")), Seq("event_type"))
        .select("event_type", "n_users", "n_events")
        .orderBy("event_type")
    }),
    "q104_salted_join" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir).select("event_id", "event_type")
      val totals = ev.groupBy("event_type")
        .agg(count(lit(1)).as("type_total"))
      saltedJoin(ev, totals, "event_type", salt = 8)
        .select("event_id", "event_type", "type_total")
        .orderBy("event_id")
    }))

  def oracle: Map[String, String] = Map(
    "q112_skew_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q104_salted_join" ->
      """SELECT e.event_id, e.event_type, t.type_total
        |FROM events e
        |JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS type_total
        |      FROM events GROUP BY event_type) t USING (event_type)
        |ORDER BY e.event_id""".stripMargin)
}
