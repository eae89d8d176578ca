package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** The q106 oracle gate runs over lineitem, which carries no nulls —
  * this spec plants them so the null-rate arithmetic (n_rows − count)
  * is actually exercised, and pins the single-aggregate plan shape. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("profile counts nulls, ndv and extrema on planted data") {
    // 10 rows; l_quantity null on 3 (ids 0,3,6 → id % 3 == 0 plants 4:
    // 0,3,6,9 — use explicit), l_extendedprice constant, keys dense
    val df = spark.range(10).selectExpr(
      "id AS l_orderkey",
      "id % 4 AS l_suppkey",
      "IF(id IN (0, 3, 6), CAST(NULL AS DOUBLE), CAST(id AS DOUBLE) + 0.25) AS l_quantity",
      "CAST(19.99 AS DOUBLE) AS l_extendedprice")
    val rows = Profile.profile(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows("l_orderkey") == ((10L, 0L, 10L, 0L, 900L)))
    assert(rows("l_suppkey") == ((10L, 0L, 4L, 0L, 300L)))
    // 7 non-null quantities: 1.25,2.25,4.25,5.25,7.25,8.25,9.25
    assert(rows("l_quantity") == ((10L, 3L, 7L, 125L, 925L)))
    assert(rows("l_extendedprice") == ((10L, 0L, 1L, 1999L, 1999L)))
  }

  test("profile is one aggregate pass: a single shuffle for stats") {
    val df = spark.range(1000).selectExpr(
      "id AS l_orderkey", "id % 7 AS l_suppkey",
      "CAST(id % 50 AS DOUBLE) AS l_quantity",
      "CAST(id AS DOUBLE) / 10 AS l_extendedprice")
    // Expand-based multi-distinct still funnels through ONE stats
    // shuffle (plus the final 4-row sort) — no per-column table passes
    assert(SparkTestSession.shuffles(Profile.profile(df)) <= 2)
  }
}
