package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (at 100 TB one hot key can pin a single reducer for hours while the
  * rest of the cluster idles).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense; salting is the explicit
  * operator form for when the small side can be replicated: the big side
  * gets a content-derived salt in [0, s), the small side is exploded to
  * every salt value, and the join key becomes (key, salt) — splitting a
  * hot key across s reducers at the cost of s× the small side. */
object Skew {

  /** Salted inner equi-join. `big ⋈ small` on `key`, with the big side's
    * rows spread across `salt` sub-keys. Result is row-identical to the
    * plain join (salting only changes the partitioning).
    *
    * The per-row salt component is a stable ordinal from `zipWithIndex`,
    * not `monotonically_increasing_id`: content alone would send EXACT
    * duplicate rows of a hot key — the most common skew shape — to one
    * reducer, mitigating nothing, while `monotonically_increasing_id` is
    * nondeterministic under fetch-failure-driven partial map-stage
    * recomputation (rows could be re-salted to a different reducer,
    * losing/duplicating join rows). `zipWithIndex` is deterministic as
    * long as the input's partition contents are (true for file scans and
    * checkpointed frames — the documented precondition); the ordinal is
    * assigned once, before the join's shuffle, so retries re-derive the
    * same salt for the same row. Round-robin `ordinal % salt` spreads a
    * hot key's rows perfectly evenly, duplicates included. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    val spark = big.sparkSession
    val indexed = big.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i % salt))
    }
    val bigS = spark.createDataFrame(indexed, big.schema.add("__salt", LongType, nullable = false))
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
