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

  test("mixed numeric+string profile: string extrema verbatim, NULLs on the foreign kind") {
    val df = spark.range(10).selectExpr(
      "id AS doc_id",
      "IF(id IN (1, 4), CAST(NULL AS STRING), concat('lang', id % 3)) AS lang")
    val rows = Profile.profile(df, Seq("doc_id"), Seq("lang")).collect()
      .map(r => r.getString(0) -> r).toMap
    val docId = rows("doc_id")
    assert((docId.getLong(1), docId.getLong(2), docId.getLong(3)) == ((10L, 0L, 10L)))
    assert((docId.getLong(4), docId.getLong(5)) == ((0L, 900L))) // e2 extrema
    assert(docId.isNullAt(6) && docId.isNullAt(7)) // no string extrema
    val lang = rows("lang")
    // 8 non-null langs over 3 distinct values; min/max by binary order
    assert((lang.getLong(1), lang.getLong(2), lang.getLong(3)) == ((10L, 2L, 3L)))
    assert(lang.isNullAt(4) && lang.isNullAt(5)) // no e2 extrema
    assert((lang.getString(6), lang.getString(7)) == (("lang0", "lang2")))
  }

  test("string-only profile keeps a string-only schema") {
    val df = spark.range(5).selectExpr("concat('s', id) AS source")
    val p = Profile.profile(df, Nil, Seq("source"))
    assert(p.columns.toSeq == Seq("col_name", "n_rows", "n_null", "ndv", "min_s", "max_s"))
    val r = p.collect().head
    assert((r.getString(4), r.getString(5)) == (("s0", "s4")))
  }

  test("temporal profile: unix-micros extrema, nulls counted, full three-kind row shape") {
    // 10 rows, ts null on 2; epoch anchored at 2024-01-01 with 1-hour
    // steps so min/max micros are exact constants
    val df = spark.range(10).selectExpr(
      "id AS event_id",
      "IF(id IN (2, 7), CAST(NULL AS TIMESTAMP), " +
        "timestamp_micros(1704067200000000 + id * 3600000000)) AS ts",
      "concat('t', id % 2) AS event_type")
    val rows = Profile.profile(df,
        numCols = Seq("event_id"), strCols = Seq("event_type"), tsCols = Seq("ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ts = rows("ts")
    assert((ts.getLong(1), ts.getLong(2), ts.getLong(3)) == ((10L, 2L, 8L)))
    // min/max land in the min_us/max_us slots (7,8); e2 + string slots NULL
    assert(ts.isNullAt(4) && ts.isNullAt(5) && ts.isNullAt(6) && ts.isNullAt(7))
    assert(ts.getLong(8) == 1704067200000000L)          // id=0
    assert(ts.getLong(9) == 1704067200000000L + 9L * 3600000000L)
    // the numeric and string branches carry NULL micros
    assert(rows("event_id").isNullAt(8) && rows("event_type").isNullAt(8))
  }

  test("profile is per-column branches: two distinct-agg shuffles per column, no Expand") {
    val df = spark.range(1000).selectExpr(
      "id AS l_orderkey", "id % 7 AS l_suppkey",
      "CAST(id % 50 AS DOUBLE) AS l_quantity",
      "CAST(id AS DOUBLE) / 10 AS l_extendedprice")
    val p = Profile.profile(df)
    // round-20 shape: each column is its own single-distinct two-level
    // aggregate (2 exchanges) + the final sort — and the ×(columns+1)
    // Expand row blowup must not exist anywhere in the plan
    assert(SparkTestSession.shuffles(p) <= 2 * 4 + 1)
    assert(SparkTestSession.collectExec(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty)
  }

  test("mixed profile (q107 shape) keeps per-column branches and no Expand") {
    val df = spark.range(1000).selectExpr(
      "id AS doc_id", "id % 97 AS n_chars",
      "concat('l', id % 5) AS lang", "concat('src', id % 11) AS source",
      "concat('text ', id) AS text")
    val p = Profile.profile(df, Seq("doc_id", "n_chars"),
      Seq("lang", "source", "text"))
    assert(SparkTestSession.shuffles(p) <= 2 * 5 + 1)
    assert(SparkTestSession.collectExec(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty)
  }

  test("histogram: buckets partition the count, bounds nest, integer bucketing matches the formula") {
    // values 1.00 .. 16.00 → cents 100..1600; nb=4, width span 1501
    val df = spark.range(1, 17).selectExpr("CAST(id AS DOUBLE) AS v")
    val rows = Profile.histogram(df, "v", 4).collect()
    assert(rows.map(_.getLong(2)).sum == 16L)   // total n conserved
    val expected = (1L to 16L).map(_ * 100).groupBy(c => math.min((c - 100) * 4 / 1501, 3))
    rows.foreach { r =>
      val (bucket, n, minC, maxC) = (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(n == expected(bucket).size, s"bucket $bucket count")
      assert(minC == expected(bucket).min && maxC == expected(bucket).max)
      assert(r.getLong(3) == expected(bucket).sum) // sum_cents
    }
    // buckets sorted, min/max nested inside [approx_lo, next approx_lo)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("histogram: constant column lands in one bucket without dividing by zero") {
    val df = spark.range(10).selectExpr("CAST(42.5 AS DOUBLE) AS v")
    val rows = Profile.histogram(df, "v", 16).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 0L && rows.head.getLong(2) == 10L)
    assert(rows.head.getLong(4) == 4250L && rows.head.getLong(5) == 4250L)
  }

  test("sketchRollup: merged estimates stay in bounds on overlapping slices and under repartitioning") {
    // 3 types × 5 days, user sets overlap across days (user_id = id % 400
    // cycles), so per-type distinct != sum of per-day distincts — the
    // case where naive COUNT(DISTINCT) rollups are WRONG and sketch
    // merging is the fix.
    def ev(parts: Int) = spark.range(3000).selectExpr(
        "concat('t', id % 3) AS event_type",
        "id % 400 AS user_id",
        // spread across 5 distinct days (86400e6 micros apart)
        "timestamp_micros(1700000000000000 + (id % 5) * 86400000000) AS ts",
        "CAST(0.0 AS DOUBLE) AS value", "id AS event_id", "'' AS props")
      .repartition(parts)
    for (parts <- Seq(1, 7)) {
      val rows = Profile.sketchRollup(ev(parts)).collect()
      assert(rows.length == 4) // t0..t2 + ALL
      rows.foreach { r =>
        assert(r.getBoolean(3), s"estimate out of bounds for ${r.getString(0)} at parts=$parts")
      }
      val all = rows.find(_.getString(0) == "ALL").get
      assert(all.getLong(1) == 400L && all.getLong(2) == 5L)
      // per-type exact: users with id%3==k — 400 users cycle through all
      // residues, every type sees well over 100 distinct users
      rows.filterNot(_.getString(0) == "ALL").foreach(r => assert(r.getLong(1) > 100L))
    }
  }

  test("sketchRollup: a REAL 'ALL' event type stays distinct from the rollup total") {
    // the sentinel-collision trap: grouping keys must be
    // (grouping_id, event_type), not a coalesced label — a literal
    // 'ALL' type would otherwise fan out the exact×merged join and
    // corrupt both its row and the grand total
    val ev = spark.range(600).selectExpr(
      "IF(id % 3 = 0, 'ALL', concat('t', id % 3)) AS event_type",
      "id % 50 AS user_id",
      "timestamp_micros(1700000000000000 + (id % 2) * 86400000000) AS ts",
      "CAST(0.0 AS DOUBLE) AS value", "id AS event_id", "'' AS props")
    val rows = Profile.sketchRollup(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    // types: ALL(real), t1, t2 + the grand total (also labeled ALL)
    assert(rows.length == 4, s"join fanned out or dropped rows: ${rows.toSeq}")
    val allRows = rows.filter(_._1 == "ALL").map(_._2).sorted.toSeq
    // gcd(3,50)=1 → both the real-ALL slice (ids ≡ 0 mod 3) and the
    // grand total cycle through all 50 user residues: two rows, 50 each
    assert(allRows == Seq(50L, 50L),
      s"expected a real-ALL row AND a total row, both 50 users: ${rows.toSeq}")
    assert(rows.forall(_._3), s"sketch bound broken: ${rows.toSeq}")
  }
}
