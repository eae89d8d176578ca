package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling — the data-quality pass every production corpus runs
  * before training (row counts, null rates, distinct counts, value
  * ranges per column; the Deequ/Great-Expectations shape, reference has
  * nothing comparable because it never validates its inputs).
  *
  * Scale posture: ONE independent aggregate branch per profiled column,
  * unioned — each branch scans exactly its own column (columnar I/O:
  * the union reads every column chunk once in total, the same bytes as
  * a single 4-column scan) and plans the single-distinct two-level
  * aggregate, so no Expand ×(columns+1) row blowup exists anywhere and
  * a string extremum can never demote the NUMERIC columns' aggregation
  * to sort-based. This replaced the round-19 single-pass Expand
  * multi-distinct in round 20: at sf0.1 the Expand form cost
  * 1.5–2.0 s/query (3.6M expanded rows for lineitem; events' string
  * branch forced SortAggregate over an 11-column sort), the union form
  * 0.2 s — and at 100 TB the union shuffles strictly fewer bytes (each
  * exchange carries one column's distinct values, never the ×(N+1)
  * expanded row stream). At 100 TB swap exact ndv for
  * approx_count_distinct (drops each branch's distinct exchange) —
  * kept exact here because the DuckDB oracle hash-compares values.
  *
  * Numeric extrema are reported ×100 as BIGINT (`*_e2`) so double
  * columns hash identically across engines (same trick as
  * Relational.cents); string extrema are reported verbatim (`*_s`) —
  * both engines compare strings by binary codepoint order, so MIN/MAX
  * agree without quantization. When both kinds are profiled the output
  * carries all four extremum columns, NULL on the kind that doesn't
  * apply; an all-numeric profile keeps the original 6-column shape.
  */
object Profile {

  /** lineitem's numeric surface: key, fk, and the two money/qty doubles. */
  private val lineitemCols = Seq("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice")

  /** Default (q106) profile: lineitem's numeric columns. */
  def profile(df: DataFrame): DataFrame = profile(df, lineitemCols, Nil)

  /** Profile `numCols` (count/ndv/min_e2/max_e2), `strCols`
    * (count/ndv/min_s/max_s), and `tsCols` (count/ndv/min_us/max_us —
    * timestamp extrema as unix micros, the engine-portable BIGINT
    * domain) in one aggregate pass over `df`. The temporal branch is
    * what catches testdata drift on time columns (a regenerated
    * events.parquet with a shifted epoch shows up here as a moved
    * min_us before any downstream window query mis-buckets). */
  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
      tsCols: Seq[String] = Nil): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty || tsCols.nonEmpty,
      "profile: no columns given")
    // union branches must be type-aligned positionally: each branch
    // carries NULLs for the other kinds' extremum columns
    val hasNum = numCols.nonEmpty; val hasStr = strCols.nonEmpty
    val hasTs = tsCols.nonEmpty
    val nullNum = Seq(lit(null).cast("long").as("min_e2"),
      lit(null).cast("long").as("max_e2"))
    val nullStr = Seq(lit(null).cast("string").as("min_s"),
      lit(null).cast("string").as("max_s"))
    val nullTs = Seq(lit(null).cast("long").as("min_us"),
      lit(null).cast("long").as("max_us"))
    // one branch per column: scan just that column, one COUNT(DISTINCT)
    // (the Expand-free two-level plan) + min/max/counts in the same agg
    def branch(c: String, v: Column, extrema: Seq[Column],
        pad: Seq[Column]): DataFrame =
      df.select(v.as("v"))
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_c"),
          countDistinct(col("v")).as("ndv"), extrema.head, extrema.last)
        .select(Seq(lit(c).as("col_name"),
          col("n_rows").cast("long").as("n_rows"),
          (col("n_rows") - col("n_c")).cast("long").as("n_null"),
          col("ndv").cast("long").as("ndv")) ++ pad: _*)
    val numBranches = numCols.map { c =>
      branch(c, col(c),
        Seq(round(min(col("v")) * 100).cast("long").as("min_e2"),
          round(max(col("v")) * 100).cast("long").as("max_e2")),
        Seq(col("min_e2"), col("max_e2")) ++
          (if (hasStr) nullStr else Nil) ++ (if (hasTs) nullTs else Nil))
    }
    val strBranches = strCols.map { c =>
      branch(c, col(c),
        Seq(min(col("v")).cast("string").as("min_s"),
          max(col("v")).cast("string").as("max_s")),
        (if (hasNum) nullNum else Nil) ++ Seq(col("min_s"), col("max_s")) ++
          (if (hasTs) nullTs else Nil))
    }
    // the whole temporal branch runs in the unix-micros BIGINT domain
    // (count/ndv are value-preserving under the conversion)
    val tsBranches = tsCols.map { c =>
      branch(c, expr(s"unix_micros($c)"),
        Seq(min(col("v")).as("min_us"), max(col("v")).as("max_us")),
        (if (hasNum) nullNum else Nil) ++ (if (hasStr) nullStr else Nil) ++
          Seq(col("min_us"), col("max_us")))
    }
    (numBranches ++ strBranches ++ tsBranches).reduce(_ unionAll _)
      .orderBy("col_name")
  }

  /** q156 — the profiler the 100 TB deployment actually defaults to:
    * same one-pass shape as [[profile]], but NDV comes from an HLL
    * sketch (lgK 14, the q120 sketch), with the exact multi-distinct
    * kept ONLY as the verification harness for the ±5 % gate (the
    * q47/q120 within-bounds convention — the oracle pins the exact
    * columns by hash and `ndv_within` to literal TRUE, so a sketch
    * drifting past the bound is a hash mismatch, not a shrug).
    *
    * Doubles are profiled in the cents domain (round(x·100) BIGINT):
    * hll_sketch_agg takes no doubles, and cents is the repo's
    * engine-portable numeric domain anyway; on integral key columns
    * ×100 is injective, so ndv/min_e2/max_e2 coincide with [[profile]].
    * At scale the exact branches are dropped and their per-column
    * distinct exchanges disappear with them — the sketch pass is plain
    * partial aggregates, one scan, one 1-row shuffle. */
  def profileApprox(df: DataFrame, numCols: Seq[String]): DataFrame = {
    require(numCols.nonEmpty, "profileApprox: no columns given")
    // the sketches run in their OWN pass: folded into a branch's exact
    // agg they would ride the single-distinct rewrite's first grouping
    // (one partial sketch PER DISTINCT VALUE, merged after — the
    // per-group-sketch blowup measured at 13 s vs 2 s back when the
    // exact side was the Expand plan) — as a plain partial aggregate
    // the sketch scan is the cheap one, and it is the ONLY pass the
    // 100 TB deployment keeps
    val skAggs = numCols.map { c =>
      expr(s"cast(hll_sketch_estimate(hll_sketch_agg(" +
        s"cast(round($c * 100) as bigint), 14)) as bigint)").as(s"est_$c")
    }
    val sk = df.agg(skAggs.head, skAggs.tail: _*)
    // exact side: one union branch per column (see [[profile]] — scans
    // its own column only, Expand-free single-distinct plan); the 1-row
    // sketch frame broadcasts under every branch and the ±5 % gate
    // picks its column's estimate by col_name
    val branches = numCols.map { c =>
      df.select(expr(s"cast(round($c * 100) as bigint)").as("v"))
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_c"),
          countDistinct(col("v")).as("ndv"),
          min(col("v")).as("min_e2"), max(col("v")).as("max_e2"))
        .select(lit(c).as("col_name"), col("n_rows").cast("long").as("n_rows"),
          (col("n_rows") - col("n_c")).cast("long").as("n_null"),
          col("ndv").cast("long").as("ndv"), col("min_e2"), col("max_e2"))
    }
    branches.reduce(_ unionAll _)
      .join(broadcast(sk))
      .withColumn("ndv_within",
        expr("abs(CASE col_name " +
          numCols.map(c => s"WHEN '$c' THEN est_$c").mkString(" ") +
          " END - ndv) * 100 <= ndv * 5"))
      .select("col_name", "n_rows", "n_null", "ndv", "min_e2", "max_e2",
        "ndv_within")
      .orderBy("col_name")
  }

  /** Equi-width histogram over a money column, integer-exact: the value
    * domain is cents (×100 BIGINT, the repo convention), bounds come
    * from a first aggregate pass (1-row result, broadcast into the
    * second pass — never collected to the driver as data), and the
    * bucket index is pure integer arithmetic
    * `least((cents-lo)*nb div (hi-lo+1), nb-1)` so both engines place
    * every boundary value identically (no float width, no rounding
    * mode to disagree on).
    *
    * Scale posture: two sequential scans (bounds, then buckets). The
    * bounds pass is a pure partial aggregate (32 partial rows → 1);
    * the bucket pass partial-aggregates per bucket map-side, so the
    * only shuffle moves ≤ nb×partitions tiny rows. A single-pass
    * variant exists (agg over pre-known bounds) when bounds are
    * available from table stats — at 100 TB you'd read lo/hi from the
    * catalog/footers instead of scanning. nb is a constant; the width
    * `(hi-lo+1) div nb` rides out in each row for plottability. */
  def histogram(df: DataFrame, valueCol: String, nb: Int): DataFrame = {
    require(nb > 0, "histogram: nb must be positive")
    val cents = df.select(round(col(valueCol) * 100).cast("long").as("cents"))
    val bounds = cents.agg(min("cents").as("lo"), max("cents").as("hi"))
    cents.join(broadcast(bounds))
      // SQL `div` = integral division (both engines floor nonnegative
      // operands identically; cents-lo >= 0 by construction)
      .withColumn("bucket",
        expr(s"least((cents - lo) * $nb div (hi - lo + 1), ${nb - 1}L)"))
      .groupBy("bucket")
      // lo/hi are row-constant: max() re-derives them per bucket instead
      // of a third table scan for the bound arithmetic
      .agg(count(lit(1)).as("n"),
        sum("cents").cast("long").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        max("lo").as("lo"), max("hi").as("hi"))
      .select(col("bucket"),
        expr(s"lo + bucket * ((hi - lo + 1) div $nb)").as("approx_lo_cents"),
        col("n"), col("sum_cents"), col("min_cents"), col("max_cents"))
      .orderBy("bucket")
  }

  /** Mergeable-sketch rollup cube: one tiny row per (event_type, day)
    * carrying a DataSketches HLL sketch of that slice's distinct users
    * (`hll_sketch_agg`), then ANY coarser slice — per type, global —
    * answered by MERGING sketches (`hll_union_agg`) instead of
    * rescanning raw data. This is the pre-aggregation pattern that
    * makes distinct-count dashboards feasible at 100 TB: the cube is
    * (types × days) rows of ~2^lgK bytes each, its build is the only
    * pass over raw events, and every subsequent slice query touches
    * only the cube (COUNT/SUM rollups compose trivially; DISTINCT
    * does not — the mergeable sketch is what restores composability).
    *
    * Gate shape (the q47 convention for approximate answers): exact
    * per-slice distinct counts hash-compare against DuckDB, and the
    * merged-sketch estimate is asserted within ±5 % of exact as a
    * boolean the oracle pins to literal TRUE — at lgK=14 the sketch
    * rsd is ~0.8 %, so the bound holds with wide margin at every SF.
    * The exact side (one Expand multi-distinct over raw) exists ONLY
    * as the verification harness; the 100 TB deployment keeps just the
    * sketch path. */
  def sketchRollup(ev: DataFrame): DataFrame = {
    val base = ev.selectExpr("event_type", "user_id",
      "unix_micros(ts) div 86400000000 AS d")
    val cube = base.groupBy("event_type", "d")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    // exact × merged are matched on (grouping_id, null-safe event_type),
    // NOT on a coalesced string sentinel: a REAL 'ALL' event type (or a
    // NULL one) must stay a distinct row from the rollup grand total —
    // a sentinel key would fan the join out and corrupt both rows. The
    // 'ALL' label below is display-only, after the join is decided.
    val merged = cube.rollup(col("event_type"))
      .agg(grouping_id().as("gid"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .alias("m")
    val exact = base.rollup(col("event_type"))
      .agg(grouping_id().as("gid"),
        countDistinct("user_id").as("exact_users"),
        countDistinct("d").as("n_days"))
      .alias("x")
    exact.join(merged,
        col("x.gid") === col("m.gid") &&
          (col("x.event_type") <=> col("m.event_type")))
      .select(coalesce(col("x.event_type"), lit("ALL")).as("event_type"),
        col("exact_users"), col("n_days"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * 0.05).as("merged_within"))
      .orderBy("event_type")
  }

  /** documents' mixed surface for q107: the numeric id/length columns
    * plus the string columns whose min/max exercise the non-numeric
    * branch (binary-collation string extrema, no ×100 quantization). */
  private val docNumCols = Seq("doc_id", "n_chars")
  private val docStrCols = Seq("lang", "source", "text")

  /** Referential-integrity audit: for each FK edge (child.childKey →
    * parent.parentKey), the child row count and the number of ORPHANS
    * (child rows whose key has no parent). The load-validation pass a
    * warehouse runs after every ingest — a partial dimension load shows
    * up here as a nonzero orphan count before any downstream join
    * silently drops rows.
    *
    * Plan per edge: distinct parent keys LEFT-joined under the child
    * (Spark broadcasts dimension-sized parents; a big-big edge like
    * lineitem→orders degrades to one shuffle join), then ONE aggregate
    * producing both counts — never two passes over the child. Edges are
    * independent single-row aggregates unioned at driver scale. */
  def fkAudit(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "fkAudit: at least one FK edge is required")
    edges.map { case (name, child, ck, parent, pk) =>
      child.select(col(ck).as("k"))
        .join(parent.select(col(pk).as("k")).distinct()
          .withColumn("__hit", lit(1)), Seq("k"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))
    }.reduce(_ unionAll _)
  }

  /** k-anonymity audit over a quasi-identifier tuple: groups with fewer
    * than `k` members are re-identification risks a release either
    * suppresses or generalizes. The governance pass next to PII
    * redaction (q54): redaction scrubs direct identifiers, this audit
    * catches the INDIRECT ones (rare attribute combinations). One
    * grouped aggregate — partial-agg combined map-side, output is
    * quasi-identifier-domain-sized, never row-sized. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long = 10L): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity: at least one quasi-identifier column")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("suppress", col("n") < k)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_profile" -> ((s, dir) => profile(Tables.lineitem(s, dir))),

    // Sketch-NDV profiler, exact side hashed + estimate gated ±5%.
    "q156_profile_approx" -> ((s, dir) =>
      profileApprox(Tables.lineitem(s, dir), lineitemCols)),

    // documents' (lang, source) cells: the sf-dependent sparse cells
    // make suppress=true rows appear organically at every SF
    "q134_k_anonymity" -> ((s, dir) =>
      kAnonymity(Tables.documents(s, dir), Seq("lang", "source"))
        .orderBy("lang", "source")),

    // Three intact edges prove the zero case; the fourth audits orders
    // against a DAMAGED customer dimension (a planted partial load:
    // every 31st-residue-5 customer missing) so a nonzero orphan count
    // is visible at every scale factor.
    "q127_fk_audit" -> ((s, dir) => fkAudit(Seq(
      ("customer->nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey"),
      ("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"),
      ("orders->customer_damaged", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir).where("c_custkey % 31 <> 5"), "c_custkey"),
      ("supplier->nation", Tables.supplier(s, dir), "s_nationkey",
        Tables.nation(s, dir), "n_nationkey")))
      .orderBy("edge")),
    "q107_profile_docs" -> ((s, dir) =>
      profile(Tables.documents(s, dir), docNumCols, docStrCols)),

    // events' full surface: all three column classes (numeric, string,
    // temporal) in ONE aggregate pass — ts was the one column class the
    // profiler couldn't see, and the one where a driver testdata
    // regeneration drifts first (the round-10 NANOS→us change).
    "q137_profile_events" -> ((s, dir) =>
      profile(Tables.events(s, dir),
        numCols = Seq("event_id", "user_id", "value"),
        strCols = Seq("event_type"),
        tsCols = Seq("ts"))),
    "q109_histogram" -> ((s, dir) =>
      histogram(Tables.lineitem(s, dir), "l_extendedprice", 16)),
    "q120_sketch_rollup" -> ((s, dir) =>
      sketchRollup(Tables.events(s, dir))))

  def oracle: Map[String, String] = {
    val liBranches = lineitemCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
         |  CAST(ROUND(MIN($c) * 100) AS BIGINT) AS min_e2,
         |  CAST(ROUND(MAX($c) * 100) AS BIGINT) AS max_e2
         |FROM lineitem""".stripMargin
    }
    val docNumBranches = docNumCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
         |  CAST(ROUND(MIN($c) * 100) AS BIGINT) AS min_e2,
         |  CAST(ROUND(MAX($c) * 100) AS BIGINT) AS max_e2,
         |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
         |FROM documents""".stripMargin
    }
    val docStrBranches = docStrCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
         |  CAST(NULL AS BIGINT) AS min_e2, CAST(NULL AS BIGINT) AS max_e2,
         |  MIN($c) AS min_s, MAX($c) AS max_s
         |FROM documents""".stripMargin
    }
    def fkEdgeSql(name: String, child: String, ck: String,
                  parentSel: String, pk: String) =
      s"""SELECT '$name' AS edge, CAST(COUNT(*) AS BIGINT) AS n_child,
         |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parentSel) p
         |  ON c.$ck = p.k""".stripMargin
    val evNumBranches = Seq("event_id", "user_id", "value").map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
         |  CAST(ROUND(MIN($c) * 100) AS BIGINT) AS min_e2,
         |  CAST(ROUND(MAX($c) * 100) AS BIGINT) AS max_e2,
         |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s,
         |  CAST(NULL AS BIGINT) AS min_us, CAST(NULL AS BIGINT) AS max_us
         |FROM events""".stripMargin
    }
    val evStrBranches = Seq("event_type").map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
         |  CAST(NULL AS BIGINT) AS min_e2, CAST(NULL AS BIGINT) AS max_e2,
         |  MIN($c) AS min_s, MAX($c) AS max_s,
         |  CAST(NULL AS BIGINT) AS min_us, CAST(NULL AS BIGINT) AS max_us
         |FROM events""".stripMargin
    }
    val evTsBranches = Seq("ts").map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT epoch_us($c)) AS BIGINT) AS ndv,
         |  CAST(NULL AS BIGINT) AS min_e2, CAST(NULL AS BIGINT) AS max_e2,
         |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s,
         |  CAST(MIN(epoch_us($c)) AS BIGINT) AS min_us,
         |  CAST(MAX(epoch_us($c)) AS BIGINT) AS max_us
         |FROM events""".stripMargin
    }
    val liApproxBranches = lineitemCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT CAST(ROUND($c * 100) AS BIGINT)) AS BIGINT) AS ndv,
         |  CAST(MIN(CAST(ROUND($c * 100) AS BIGINT)) AS BIGINT) AS min_e2,
         |  CAST(MAX(CAST(ROUND($c * 100) AS BIGINT)) AS BIGINT) AS max_e2,
         |  TRUE AS ndv_within
         |FROM lineitem""".stripMargin
    }
    Map(
      "q106_profile" ->
        (liBranches.mkString("\n", "\nUNION ALL\n", "\n") + "ORDER BY col_name"),

      // the exact columns are hash-pinned; ndv_within must be literal
      // TRUE on the Spark side too (the q47 within-bounds contract)
      "q156_profile_approx" ->
        (liApproxBranches.mkString("\n", "\nUNION ALL\n", "\n") + "ORDER BY col_name"),
      "q137_profile_events" ->
        ((evNumBranches ++ evStrBranches ++ evTsBranches)
          .mkString("\n", "\nUNION ALL\n", "\n") + "ORDER BY col_name"),
      "q134_k_anonymity" ->
        """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
          |  COUNT(*) < 10 AS suppress
          |FROM documents GROUP BY lang, source
          |ORDER BY lang, source""".stripMargin,
      "q127_fk_audit" ->
        (Seq(
          fkEdgeSql("customer->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
          fkEdgeSql("lineitem->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          fkEdgeSql("orders->customer_damaged", "orders", "o_custkey",
            "(SELECT * FROM customer WHERE c_custkey % 31 <> 5)", "c_custkey"),
          fkEdgeSql("supplier->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey"))
          .mkString("\n", "\nUNION ALL\n", "\n") + "ORDER BY edge"),
      "q107_profile_docs" ->
        ((docNumBranches ++ docStrBranches).mkString("\n", "\nUNION ALL\n", "\n") +
          "ORDER BY col_name"),
      "q109_histogram" ->
        """WITH cents AS (
          |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
          |bounds AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM cents)
          |SELECT LEAST((cents - lo) * 16 // (hi - lo + 1), 15) AS bucket,
          |  lo + LEAST((cents - lo) * 16 // (hi - lo + 1), 15) * ((hi - lo + 1) // 16) AS approx_lo_cents,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
          |  MIN(cents) AS min_cents, MAX(cents) AS max_cents
          |FROM cents, bounds
          |GROUP BY bucket, approx_lo_cents
          |ORDER BY bucket""".stripMargin,
      "q120_sketch_rollup" ->
        """SELECT COALESCE(event_type, 'ALL') AS event_type,
          |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
          |  CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days,
          |  TRUE AS merged_within
          |FROM events GROUP BY ROLLUP(event_type)
          |ORDER BY event_type""".stripMargin)
  }
}
