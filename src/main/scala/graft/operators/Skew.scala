package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    * The salt mixes row content with a per-row physical component
    * (`monotonically_increasing_id`): content alone would send EXACT
    * duplicate rows of a hot key — the most common skew shape — to one
    * reducer, mitigating nothing. The trade-off is that the partitioning
    * (never the result set) can differ across runs if the input's
    * physical row order differs. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    val saltCol: Column =
      pmod(xxhash64(big.columns.map(col).toIndexedSeq :+ monotonically_increasing_id(): _*),
        lit(salt.toLong))
    val bigS = big.withColumn("__salt", saltCol)
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
