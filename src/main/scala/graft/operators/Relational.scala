package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator core — the Spark-first re-expression of every
  * pure-relational operation in the reference (SURVEY.md §2):
  *
  *  - C1 null/""-coalesce clean        (/root/reference/src/transform_load.py:23-31)
  *  - W1 keep-first-per-group dedup    (transform_load.py:47-70, made deterministic)
  *  - A1/A2/H1 group-count / collect-per-group / having (transform_load.py:47-53)
  *  - J1/J3 FK join + anti-join delete (transform_load.py:80-93, 57-70)
  *  - P1/X1 projection + filename formatting (ingestion.py:70-83, 65)
  *  - F-family filters                 (ingestion.py:42-55, transform_load.py:82-88)
  *  - L1 filter-then-limit / top-k     (ingestion.py:34-35)
  *  - M1/M2 deterministic train/val/test split (transform_load.py:129-142;
  *    64/16/20 per SURVEY §0 — expressed as a hash split so the DuckDB
  *    oracle reproduces it exactly, unlike `randomSplit`)
  *  - X4 JSON field access             (ingestion.py:48,73-79)
  *
  * All functions are pure `DataFrame => DataFrame` transforms; Catalyst
  * provides pushdown/pruning/join-selection (SURVEY.md §4). Money sums are
  * computed as integer cents (`round(x*100)` → long) so results are exact
  * and order-independent — a 100 TB shuffle must not make the answer
  * nondeterministic at the ULP level.
  */
object Relational {

  // ---------------------------------------------------------------- C1
  /** Map null or empty-string to a sentinel for the given columns.
    * Reference semantics are Python truthiness (`if not doc.get(field)`),
    * so "" must be caught too — plain `na.fill` would miss it. */
  def cleanNa(df: DataFrame, fields: Seq[String], sentinel: String = "NA"): DataFrame =
    fields.foldLeft(df) { (d, f) =>
      d.withColumn(f, when(col(f).isNull || col(f) === "", lit(sentinel)).otherwise(col(f)))
    }

  // ---------------------------------------------------------------- W1
  /** Keep exactly one row per key, deterministically: the first under
    * `order`. The reference keeps Mongo's unspecified `$push` order
    * (transform_load.py:58-60); we define the tiebreak. Single shuffle on
    * the key — at scale this is one hash exchange + in-partition sort,
    * and AQE handles key skew. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J3: dedup via anti-join — the reference's delete-the-victims form
    * (transform_load.py:62-70). Semantically equal to keepFirst; kept as
    * the explicit anti-join surface. */
  def deleteDupVictims(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order)

  // ---------------------------------------------------------------- M1/M2
  /** Deterministic 64/16/20 split label (SURVEY §0: the reference's nested
    * train_test_split yields 64/16/20, not the README's 80/10/10). A
    * multiplicative hash on the key keeps it reproducible across engines
    * and cluster sizes — no RNG, no collect. */
  def splitLabel(key: Column): Column = {
    // Knuth multiplicative hash. The key is reduced mod P (~1e9) FIRST so
    // the multiplication stays under Long.MaxValue for any input — ANSI
    // mode (default in Spark 4) turns silent overflow into a job-failing
    // SparkArithmeticException at 100 TB-scale ids otherwise.
    val m = pmod(pmod(key, lit(1000000007L)) * lit(2654435761L) + lit(40503L), lit(10000L))
    when(m < 6400, "train").when(m < 8000, "validation").otherwise("test")
  }

  /** Integer-cents representation of a 2-decimal money double: exact,
    * associative, safe to sum in any shuffle order. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact `ntile(n)` over a TOTAL order WITHOUT a single-partition
    * window — the scalable spelling of
    * `ntile(n).over(Window.orderBy(...))`, whose unpartitioned
    * WindowExec moves the whole frame to ONE task (the r16 verdict's
    * q199 finding; Spark itself warns "Moving all data to a single
    * partition").
    *
    * Mechanics (the distributed-rank pattern): range-repartition on
    * (groupCols ++ order) — groups land contiguous and each partition
    * holds one contiguous slice of the total order — then rank = a
    * row_number window PARTITIONED by the physical partition id plus
    * that partition's exclusive offset. The offsets are the ≤`parts`
    * per-partition counts (a bounded, model-state-class collect — the
    * centroid convention), inlined as a CASE literal, so no
    * unpartitioned window exists anywhere in the plan. Per-group tile
    * boundaries come from a #groups-sized aggregate broadcast back.
    * The tile formula reproduces SQL NTILE exactly (first N mod n
    * tiles get ⌈N/n⌉ rows): both engines' NTILE agree with it, so
    * callers' oracle hashes are unchanged vs the window spelling
    * (QuantileSpec pins the equivalence property-style).
    *
    * Requirements: `order` must be a TOTAL order (include a unique
    * tiebreak — equal keys split across partitions would otherwise
    * make ranks nondeterministic). The input is cached post-exchange
    * so the count job and the rank job see the SAME physical
    * partitions (and the upstream — often a corpus scan + scoring
    * fold — is paid once, the BM25 convention); the frame is the
    * narrow (group, order-key) projection, corpus-row-sized but
    * few-column.
    *
    * 100 TB posture: every window is partition-local (corpus/`parts`,
    * and `parts` grows with the cluster); the only driver state is
    * `parts` longs. This is the exact form; the sampled-cutpoint
    * siblings (q208/q209) are the cheaper approximation registered
    * beside it. */
  private[graft] def distributedNtile(df: DataFrame, n: Int,
      groupCols: Seq[String], order: Seq[Column], parts: Int = 32,
      tileCol: String = "__tile"): DataFrame = {
    require(n > 0 && parts > 0)
    val sortExprs = groupCols.map(col) ++ order
    val ranged = df.repartitionByRange(parts, sortExprs: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val counts = ranged.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val offs = (0 until parts).scanLeft(0L)((acc, p) =>
      acc + counts.getOrElse(p, 0L))
    val offExpr = (0 until parts).foldLeft(when(lit(false), lit(0L))) {
      case (e, p) => e.when(col("__pid") === p, lit(offs(p)))
    }.otherwise(lit(0L))
    val w = Window.partitionBy("__pid").orderBy(sortExprs: _*)
    val ranked = ranged
      .withColumn("__rank", row_number().over(w).cast("long") + offExpr)
    val withGroup =
      if (groupCols.isEmpty)
        ranked.withColumn("__start", lit(1L))
          .withColumn("__n", lit(offs(parts)))
      else {
        val g = ranked.groupBy(groupCols.map(col): _*)
          .agg(min("__rank").as("__start"), count(lit(1)).as("__n"))
        ranked.join(broadcast(g), groupCols)
      }
    // SQL NTILE: q = N div n, rem = N mod n; the first rem tiles have
    // q+1 rows. r is the 1-based rank WITHIN the group.
    withGroup
      .withColumn("__r", col("__rank") - col("__start") + lit(1L))
      .withColumn(tileCol, expr(
        s"""CASE WHEN __r <= (__n % $n) * (__n div $n + 1)
           |  THEN (__r - 1) div (__n div $n + 1) + 1
           |  ELSE (__n % $n) + (__r - (__n % $n) * (__n div $n + 1) - 1)
           |       div (__n div $n) + 1 END""".stripMargin))
      .drop("__pid", "__rank", "__start", "__n", "__r")
  }

  /** Shared W1 core for q01/q02: one row kept per (l_orderkey,
    * l_partkey), chosen by the TOTAL packed order documented at q01.
    * Returns the kept row with every payload column decoded from the
    * single min'd long (ln/suppkey/qty/cents/flag bit fields). */
  /** The q01/q02 keep-first order as ONE packed long. Bit layout (low to
    * high): flag ordinal (2 bits, closed domain {A,N,R}), price cents
    * (24 bits, ≤16,777,215 i.e. price ≤ 167,772.15), qty×100 (13 bits,
    * ≤8,191 i.e. quantity ≤ 81.91 with ≤2 decimals), suppkey (20 bits,
    * ≤1,048,575), linenumber (3 bits, 1–7). Rows OUTSIDE these bounds
    * fail the job loudly via raise_error rather than silently packing a
    * wrong order — PackedKeepFirstProps drives every field to and past
    * its bound. The oracle twin tie-breaks on the SAME quantized keys
    * (ROUND(l_quantity*100), ROUND(l_extendedprice*100)), so both
    * engines compare identical integers, not raw doubles. */
  private[graft] def packedOrdExpr: Column = {
    val qtyE2 = cents(col("l_quantity"))
    val priceE2 = cents(col("l_extendedprice"))
    // no .otherwise → null marks an out-of-domain flag for the guard
    val flagOrd = when(col("l_returnflag") === "A", 0L)
      .when(col("l_returnflag") === "N", 1L)
      .when(col("l_returnflag") === "R", 2L)
    val inBounds = col("l_linenumber").between(1, 7) &&
      col("l_suppkey").between(0, 1048575) &&
      qtyE2.between(0, 8191) &&
      priceE2.between(0, 16777215) &&
      flagOrd.isNotNull
    val packed = col("l_linenumber") * lit(1L << 59) +
      col("l_suppkey") * lit(1L << 39) +
      qtyE2 * lit(1L << 26) +
      priceE2 * lit(1L << 2) +
      flagOrd
    when(inBounds, packed).otherwise(raise_error(concat(
      lit("packedKeepFirst: row outside documented bit-field bounds "),
      lit("(ln 1-7, suppkey<=1048575, qty<=81.91, price<=167772.15, flag in A/N/R): "),
      lit("ln="), col("l_linenumber").cast("string"),
      lit(" suppkey="), col("l_suppkey").cast("string"),
      lit(" qty="), col("l_quantity").cast("string"),
      lit(" price="), col("l_extendedprice").cast("string"),
      lit(" flag="), col("l_returnflag"))))
  }

  private def packedKeepFirst(lineitem: org.apache.spark.sql.DataFrame) = {
    val packed = lineitem.select(col("l_orderkey"), col("l_partkey"),
      packedOrdExpr.as("ord"))
    packed.groupBy("l_orderkey", "l_partkey")
      .agg(min(col("ord")).as("ord"))
      .select(col("l_orderkey"), col("l_partkey"),
        expr("ord div 576460752303423488").as("l_linenumber"),
        expr("(ord div 549755813888) % 1048576").as("l_suppkey"),
        (expr("(ord div 67108864) % 8192").cast("double") / 100.0).as("l_quantity"),
        expr("(ord div 67108864) % 8192").as("qty_e2"),
        expr("(ord div 4) % 16777216").as("price_cents"),
        expr("CASE ord % 4 WHEN 0 THEN 65 WHEN 1 THEN 78 ELSE 82 END").as("flag_a"))
  }

  // ---------------------------------------------------------------- queries
  // Driver correctness surface: name -> (spark, sfDir) => DataFrame, with a
  // DuckDB twin in `oracle`. Aliases and ORDER BY are identical on both
  // sides (driver hash-compares after sorting columns by name).

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: W1 dedup + A1 group-count + H1 having in one plan. The
    // dedup runs as a HASH-aggregable form of W1: the keep-first order
    // packs the ENTIRE payload into ONE long whose numeric order is the
    // lexicographic order (l_linenumber, l_suppkey, l_quantity,
    // price_cents, returnflag) — a TOTAL order, so the kept row is
    // deterministic even when two physical rows share the full
    // (linenumber, suppkey) sub-key (the regenerated sf0.001 testdata
    // contains exactly such a payload-ambiguous duplicate; min_by
    // against a non-total key was nondeterministic there). Bit layout,
    // high to low: ln 3 bits (≤7) | suppkey 20 (≤1,048,575 — TPC-H
    // SF≈100k) | qty_e2 13 (quantity·100 ≤ 8191) | cents 24
    // (≤$167,772) | flag 2 ({A,N,R} mapped 0/1/2, alphabetical). 62
    // bits total; if the driver's data ever exceeds a bound the packed
    // order diverges from the oracle's ORDER BY and the hash gate
    // catches it. One min() buffer per group (primitive long), so the
    // whole dedup is a single HashAggregate with map-side combine —
    // min(struct(...)) would fall back to SortAggregate, the window
    // form would shuffle + sort every row, and the previous
    // three-min_by form carried 3 buffers where one suffices.
    "q01_dedup_group" -> ((s, dir) => {
      val first = packedKeepFirst(Tables.lineitem(s, dir))
      first.groupBy(chr(col("flag_a")).as("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
             // qty_e2 sums exactly in integers; one double division +
             // round at the END matches DuckDB's round(SUM(l_quantity))
             round(sum(col("qty_e2")) / 100.0).cast("long").as("sum_qty"),
             sum(col("price_cents")).cast("long").as("revenue_cents"))
        .filter(col("n_rows") > 10)
        .orderBy(col("l_returnflag"))
    }),

    // W1 alone: deduped row subset, deterministic keep-first — same
    // total-order packed encoding as q01 (see above), every output
    // column decoded from the single min'd long.
    "q02_keep_first" -> ((s, dir) => {
      packedKeepFirst(Tables.lineitem(s, dir))
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), chr(col("flag_a")).as("l_returnflag"))
        .orderBy("l_orderkey", "l_partkey")
    }),

    // C1 clean: null/"" -> "NA" (documents table stands in for artwork_metadata).
    "q03_clean_na" -> ((s, dir) => {
      cleanNa(Tables.documents(s, dir), Seq("lang", "source"))
        .select(col("doc_id"), col("lang").as("lang_clean"), col("source").as("source_clean"))
        .orderBy("doc_id")
    }),

    // P1 projection + rename + literal + X1 filename format.
    "q04_project" -> ((s, dir) => {
      Tables.part(s, dir).select(
        col("p_partkey").as("object_id"),
        col("p_name").as("title"),
        lit("The MET Museum API").as("source"),
        concat(col("p_partkey").cast("string"), lit(".jpg")).as("filename"))
        .orderBy("object_id")
    }),

    // F-family composite filter (status + value + non-null predicate).
    "q05_filter" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "click") &&
                col("value") > 50 && col("props").isNotNull)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    }),

    // J1 FK joins: orders ⋈ customer ⋈ nation, agg per nation. Only the
    // fixed-cardinality dim (nation, 25 rows at every SF) gets a hard
    // broadcast hint; customer grows with SF, so AQE's size-based join
    // selection decides — it still broadcasts at small SF, but at 100×
    // it degrades to a shuffle join instead of OOMing the driver.
    "q06_join_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
             sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
        .orderBy("n_name")
    }),

    // J3 anti-join: customers with no high-value orders (the delete-victims
    // shape — filter pushes below the anti-join's build side).
    "q07_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Semi-join: customers with at least one order.
    "q08_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    }),

    // L1 top-k with deterministic tiebreak.
    "q09_topk" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // A2 collect-per-group, deterministic order, string-joined for parity.
    "q10_collect" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(expr("array_join(transform(sort_array(collect_list(o_orderkey)), x -> cast(x as string)), ',')").as("order_keys"),
             count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 1)
        .orderBy("o_custkey")
    }),

    // A1+H1: group-count with having (the reference's dup-detector shape,
    // transform_load.py:47-53, on orders-per-customer).
    "q11_having" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 5)
        .orderBy("o_custkey")
    }),

    // M1/M2 deterministic 64/16/20 split + per-split agg.
    "q12_split" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("split", splitLabel(col("o_orderkey")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_rows"),
             sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
        .orderBy("split")
    }),

    // X1–X5 scalar-function surface (formatting, string ops, date parts).
    "q14_scalar" -> ((s, dir) => {
      Tables.orders(s, dir).selectExpr(
        "o_orderkey",
        "format_string('%08d', o_orderkey) AS pad8",
        "cast(year(o_orderdate) as bigint) AS yr",
        "cast(month(o_orderdate) as bigint) AS mo",
        "upper(substring(o_orderpriority, 1, 3)) AS pri3",
        "cast(instr(o_orderpriority, '-') as bigint) AS dash_at",
        "lpad(cast(o_custkey as string), 10, '0') AS cust10",
        "replace(o_orderstatus, 'O', 'OPEN') AS status_long")
        .orderBy("o_orderkey")
    }),

    // X4 JSON field access on events.props.
    "q13_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k") > 50)
        .select("event_id", "event_type", "k")
        .orderBy("event_id")
    }),

    // X4 at scale: semi-structured access via Spark 4's VARIANT type.
    // q13's get_json_object re-parses the string per path — fine for one
    // field, quadratic in paths for wide extraction. VARIANT parses ONCE
    // into a binary-encoded value and each variant_get is a cheap typed
    // probe — the 100 TB posture for telemetry blobs read by many
    // downstream fields. The document is planted (props is single-field
    // in the testdata, like q54/q55 plant PII/markup): nested object +
    // two sibling fields, three typed extractions from one parse.
    "q105_json_variant" -> ((s, dir) => {
      Tables.events(s, dir)
        .selectExpr("event_id",
          "concat('{\"meta\":', props, ',\"type\":\"', event_type, " +
            "'\",\"cents\":', cast(round(value * 100) as bigint), '}') AS doc")
        // try_parse_json: malformed documents yield a NULL variant (every
        // variant_get then NULL, dropped by the filter) — symmetric with
        // the DuckDB twin's json_extract_string, which NULLs rather than
        // throws. Plain parse_json would fail the whole query on one bad
        // blob — the wrong posture for 100 TB of telemetry.
        .selectExpr("event_id", "try_parse_json(doc) AS v")
        .selectExpr("event_id",
          "variant_get(v, '$.meta.k', 'bigint') AS k",
          "variant_get(v, '$.type', 'string') AS etype",
          "variant_get(v, '$.cents', 'bigint') AS cents")
        .filter("k > 50")
        .orderBy("event_id")
    }),

    // Set ops: union of labeled slices (K7's three loops collapsed).
    "q15_union" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val hi = o.filter(col("o_totalprice") >= 200000).withColumn("bucket", lit("high"))
      val lo = o.filter(col("o_totalprice") < 200000).withColumn("bucket", lit("low"))
      hi.unionByName(lo)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("bucket")
    }),

    // Window running total per customer (cumulative cents over order date).
    "q16_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("cum_cents", sum(cents(col("o_totalprice"))).over(w).cast("long"))
        .select("o_custkey", "o_orderkey", "cum_cents")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Window navigation: lag/lead/rank/ntile under a deterministic order.
    "q31_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("c", cents(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(lag(col("c"), 1).over(w), lit(-1L)).as("prev_cents"),
          coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_key"),
          rank().over(w).cast("long").as("rnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Set operations: INTERSECT / EXCEPT over derived key sets.
    "q32_setops" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val hi = o.filter(col("o_totalprice") >= 300000).select(col("o_custkey")).distinct()
      val lo = o.filter(col("o_totalprice") < 100000).select(col("o_custkey")).distinct()
      hi.intersect(lo).withColumn("tag", lit("both"))
        .unionByName(hi.except(lo).withColumn("tag", lit("only_high")))
        .select("tag", "o_custkey")
        .orderBy("tag", "o_custkey")
    }),

    // Distinct aggregates.
    "q33_distinct_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             countDistinct(col("o_custkey")).as("n_customers"),
             countDistinct(col("o_orderstatus")).as("n_statuses"))
        .orderBy("o_orderpriority")
    }),

    // Rollup with grouping id (subtotal/grand-total rows).
    "q34_rollup" -> ((s, dir) => {
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("g"),
             count(lit(1)).as("n_orders"),
             sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
        .orderBy(col("g"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Sessionization: 30-minute inactivity gap → new session; per-session
    // event counts. Integer-µs arithmetic for cross-engine exactness.
    "q35_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_us", lag(expr("unix_micros(ts)"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
               expr("unix_micros(ts)") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "sess")
    }),

    // Top-k per group: highest-value events per type, deterministic tiebreak.
    "q39_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("event_type"), col("rnk").cast("long").as("rnk"),
          col("event_id"), col("value"))
        .orderBy("event_type", "rnk")
    }),

    // Classic TPC-H shapes adapted to this schema (o_orderpriority stands
    // in for o_shippriority; revenue in exact cents).
    // TPC-H Q1 pricing summary — every aggregate integer-exact: per-row
    // cents rounding is deterministic (same IEEE product both engines,
    // half-up = half-away-from-zero for positives), integer sums are
    // shuffle-order-independent, and the averages are integer divisions
    // of those sums. One partial-agg shuffle over 6 groups.
    "q72_tpch_q1" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= "1998-09-02")
        .selectExpr(
          "l_returnflag", "l_linestatus",
          "cast(round(l_quantity) as bigint) AS qty",
          "cast(round(l_extendedprice * 100) as bigint) AS base_c",
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) AS disc_c",
          "cast(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) as bigint) AS charge_c")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").cast("long").as("sum_qty"),
          sum("base_c").cast("long").as("sum_base_cents"),
          sum("disc_c").cast("long").as("sum_disc_cents"),
          sum("charge_c").cast("long").as("sum_charge_cents"),
          count(lit(1)).as("n_rows"))
        .selectExpr("l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
          "sum_disc_cents", "sum_charge_cents",
          "100 * sum_qty div n_rows AS avg_qty_e2",
          "sum_base_cents div n_rows AS avg_base_cents", "n_rows")
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q4 adapted (no l_commitdate/l_receiptdate in this schema:
    // "late" = shipped after the order date): priority counts of orders
    // in a quarter having at least one late line. EXISTS plans as a
    // LEFT SEMI join — one shuffle pair, no row duplication however
    // many lines match (the reason Q4 is a semi-join benchmark).
    "q80_tpch_q4" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      val l = Tables.lineitem(s, dir)
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q21 adapted (returns instead of receipt-delays): suppliers
    // who were the SOLE supplier with returned ('R') lines in a
    // multi-supplier order — a correlated EXISTS + NOT EXISTS pair,
    // planned as one semi and one anti join over the same distinct
    // (order, supplier) frame. Counts are per distinct pair, top 10.
    // One pass over the (orderkey, suppkey) pair frame instead of the
    // textbook EXISTS/NOT-EXISTS pair of distincts + anti-join (the
    // q61/q97 pattern): per pair, did this supplier return anything;
    // per order, how many suppliers, how many returned, and WHICH
    // supplier if exactly one. "Sole returner among ≥2-supplier orders"
    // is then a filter — two fact shuffles total (pair agg, order agg,
    // both map-side combined), no anti-join; the supplier dim is
    // SF-scaled, so its join is unhinted (AQE broadcasts at test SFs).
    "q81_tpch_q21" -> ((s, dir) => {
      // ONE exchange serves both aggregation levels: hash-partitioning
      // on l_orderkey alone satisfies ClusteredDistribution for the
      // (l_orderkey, l_suppkey) grouping AND the l_orderkey rollup
      // (subset-of-keys partitioning), so the per-order rollup that
      // previously forced a second full exchange is partition-local
      val pairAgg = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("ret"))
      val sole = pairAgg.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("ret").as("n_ret"),
          max(when(col("ret") === 1, col("l_suppkey"))).as("l_suppkey"))
        .where("n_supp >= 2 AND n_ret = 1")
      sole.join(Tables.supplier(s, dir),
          sole("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name")).limit(10)
    }),

    // TPC-H Q7 volume shipping: revenue between two nations by year —
    // a 4-way join where nation joins BOTH ends (supplier + customer).
    // The literal OR'd nation-pair predicate spans both sides, but its
    // IMPLIED single-side conjuncts (each nation column IN the pair) are
    // pushable — Catalyst does not derive them, so we do: filter both
    // 25-row nation frames to 2 rows and broadcast-join supplier/customer
    // to them BEFORE the expensive orderkey join, eliminating ~92% of
    // fact rows up front; the OR residual then only sees 2×2 nation combos.
    "q82_tpch_q7" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") <= "1997-12-31")
      val o = Tables.orders(s, dir)
      val n1 = Tables.nation(s, dir).toDF("n1_key", "supp_nation", "n1_r")
        .where(col("supp_nation").isin(pair: _*))
      val n2 = Tables.nation(s, dir).toDF("n2_key", "cust_nation", "n2_r")
        .where(col("cust_nation").isin(pair: _*))
      // supplier/customer pre-pruned to the two nations (broadcast, 2-row dims)
      val su = Tables.supplier(s, dir)
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      val c = Tables.customer(s, dir)
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      l.join(su, l("l_suppkey") === col("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === col("c_custkey"))
        .where("(supp_nation = 'NATION_1' AND cust_nation = 'NATION_2') OR " +
               "(supp_nation = 'NATION_2' AND cust_nation = 'NATION_1')")
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("yr"))
        .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("long").as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // TPC-H Q8 market share: one nation's share of PROMO-part revenue
    // into one region, by year. Ratio emitted as integer-exact
    // numerator/denominator cents plus share_e6 (num·1e6 div den).
    "q83_tpch_q8" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") <= "1997-12-31")
      val su = Tables.supplier(s, dir)
      val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
      val nc = Tables.nation(s, dir).toDF("nc_key", "nc_name", "nc_r")
      val ns = Tables.nation(s, dir).toDF("ns_key", "supp_nation", "ns_r")
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      // customer pre-pruned to the region BEFORE meeting the fact (the
      // q82 pattern): the nation⋈region broadcast chain keeps ~1/5 of
      // customers, so every join above the o⋈c edge carries 5× fewer
      // rows than filtering after the join would
      val c = Tables.customer(s, dir)
        .join(broadcast(nc), col("c_nationkey") === col("nc_key"))
        .join(broadcast(r), col("nc_r") === r("r_regionkey"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(ns), su("s_nationkey") === col("ns_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(
          sum(expr("CASE WHEN supp_nation = 'NATION_3' THEN cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) ELSE 0L END"))
            .cast("long").as("nation_cents"),
          sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
            .cast("long").as("total_cents"))
        .selectExpr("yr", "nation_cents", "total_cents",
          "nation_cents * 1000000 div total_cents AS share_e6")
        .orderBy("yr")
    }),

    // TPC-H Q14 promo revenue share by month over 1996 — same
    // integer-ratio contract as q83.
    "q84_tpch_q14" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      val p = Tables.part(s, dir)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(month(col("l_shipdate")).cast("long").as("mo"))
        .agg(
          sum(expr("CASE WHEN p_type = 'PROMO' THEN cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) ELSE 0L END"))
            .cast("long").as("promo_cents"),
          sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
            .cast("long").as("total_cents"))
        .selectExpr("mo", "promo_cents", "total_cents",
          "promo_cents * 1000000 div total_cents AS promo_e6")
        .orderBy("mo")
    }),

    // TPC-H Q13 customer distribution adapted (no o_comment in this
    // schema; the excluded class is URGENT-priority orders, and every
    // customer here has SOME order so the left-outer zero bucket comes
    // from the filter, as in the original): customers × their count of
    // urgent orders — LEFT OUTER so zero-count customers survive —
    // then the distribution of those counts. The first aggregation
    // shuffles on custkey; the second groups a 1500-row frame on a
    // tiny domain (partial agg collapses it map-side).
    "q87_tpch_q13" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q15 top supplier: quarterly revenue per supplier, keep the
    // supplier(s) at the maximum. Revenue in exact cents makes the max
    // well-defined across engines; the max is a ONE-ROW aggregate
    // broadcast back (a rank() over an unpartitioned window would
    // funnel every supplier through a single task at scale).
    "q88_tpch_q15" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("long").as("total_revenue_cents"))
      val top = rev.agg(max("total_revenue_cents").as("mx"))
      rev.join(broadcast(top), col("total_revenue_cents") === col("mx"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 small-quantity parts adapted (no p_container): for one
    // brand, lines whose quantity is under HALF that part's average.
    // The correlated scalar subquery is decorrelated into one per-part
    // aggregate joined back — at scale a single extra shuffle of
    // (partkey, sum, count) rows instead of a per-row subquery. The
    // threshold compare is integer-exact by cross-multiplication:
    // qty < 0.5·(qsum/qn)  ⇔  2·qty·qn < qsum (quantities integral).
    "q89_tpch_q17" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val pa = l.groupBy(col("l_partkey").as("pk"))
        .agg(sum(expr("cast(round(l_quantity) as bigint)")).cast("long").as("qsum"),
             count(lit(1)).as("qn"))
      val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#1")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(pa, l("l_partkey") === pa("pk"))
        .where(expr("2 * cast(round(l_quantity) as bigint) * qn < qsum"))
        .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
          .cast("long").as("total_cents"),
          count(lit(1)).as("n_rows"))
        .selectExpr("total_cents", "n_rows", "total_cents div n_rows AS avg_cents")
    }),

    // TPC-H Q19 discounted-revenue adapted (no container/shipmode): a
    // 3-arm OR-of-ANDs over (brand, size, quantity) bands on a joined
    // pair — the classic test that the optimizer extracts the common
    // join key from the disjunction and pushes the per-table arms into
    // both scans instead of evaluating the OR post-join only.
    "q90_tpch_q19" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .where(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("long").as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q22 global-sales-opportunity adapted (no c_phone — the
    // country-code arm is a nationkey set; every customer has SOME
    // order, so "dormant" = no order since 1999): above-average-balance
    // customers in 7 nations with no recent orders. The average is a
    // one-row aggregate (broadcast scalar, integer-floor division both
    // engines), the NOT EXISTS a left-anti join against date-filtered
    // orders — both inputs shrink before the only real shuffle.
    "q91_tpch_q22" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .where(col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
        .withColumn("bal_cents", expr("cast(round(c_acctbal * 100) as bigint)"))
      val thr = c.where(col("c_acctbal") > 0)
        .agg(expr("sum(bal_cents) div count(1)").as("thr"))
      val recent = Tables.orders(s, dir)
        .where(col("o_orderdate") >= "1999-01-01").select("o_custkey")
      c.crossJoin(broadcast(thr))
        .where(col("bal_cents") > col("thr"))
        .join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum("bal_cents").cast("long").as("totacctbal_cents"))
        .orderBy("cntrycode")
    }),

    // TPC-H Q12 shipping-priority split adapted (no l_shipmode /
    // commit / receipt dates): lineitem⋈orders two-class conditional
    // agg — URGENT+HIGH orders vs the rest, per return flag, over one
    // ship year. Both CASE sums ride ONE partial aggregate after the
    // orderkey join; the date + flag filters land in the lineitem scan
    // (PushedFilters), so the join input is pre-shrunk map-side.
    "q94_tpch_q12" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_returnflag")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .cast("long").as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .cast("long").as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q16 supplier relationship count adapted (no partsupp, no
    // s_comment): the observed part⋈supplier pairs come from lineitem
    // (DISTINCT partkey,suppkey — the partsupp stand-in), "complaint"
    // suppliers are the negative-balance ones, removed by anti-join
    // BEFORE the expensive distinct-count; suppliers counted DISTINCT
    // per (brand, type, size) over filtered parts. The pair-distinct
    // and the count-distinct are the only two real shuffles; part and
    // the excluded-supplier sliver broadcast under AQE.
    "q95_tpch_q16" -> ((s, dir) => {
      // selective part filter BELOW the distinct: the part join prunes
      // fact rows before the (pk, sk) dedup shuffle, and the part
      // attributes ride through the distinct (functionally dependent
      // on pk) so no second part join is needed. `part` is SF-scaled
      // (the filter cuts it ~6-8x but it still grows with the corpus),
      // so NO broadcast hint — AQE broadcasts it at every test SF and
      // falls back to a shuffle join past the threshold, instead of a
      // forced hint aborting at 100x. The complaint-supplier anti-join
      // stays above the dedup — it removes suppliers, not parts, and
      // runs on the already-small frame.
      val p = Tables.part(s, dir)
        .where(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val pairs = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey")
        .join(p, col("l_partkey") === p("p_partkey"))
        .select("l_partkey", "l_suppkey", "p_brand", "p_type", "p_size")
        .distinct()
      val complainers = Tables.supplier(s, dir)
        .where(col("s_acctbal") < 0).select("s_suppkey")
      pairs
        .join(complainers, pairs("l_suppkey") === complainers("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
    }),

    // TPC-H Q9 product-type profit adapted (no partsupp — supply cost
    // modeled as 60% of the part's retail price, in exact cents): for
    // parts matching a name fragment, profit per supplier nation per
    // order year. The fact table joins the filtered part sliver FIRST
    // (broadcast under AQE) so the supplier/orders joins see only
    // matching lines; every money term is integral cents.
    "q96_tpch_q9" -> ((s, dir) => {
      val p = Tables.part(s, dir).where(col("p_name").like("%gear%"))
        .withColumn("cost_cents", expr("cast(round(p_retailprice * 60) as bigint)"))
        .select("p_partkey", "cost_cents")
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
      val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) " +
            "- cost_cents * cast(round(l_quantity) as bigint)"))
          .cast("long").as("profit_cents"))
        .orderBy(asc("nation"), desc("yr"))
    }),

    // TPC-H Q20 excess-stock suppliers adapted (no partsupp): the
    // supplier-part relationship AND its "available quantity" both
    // derive from lineitem — availqty := the pair's all-time shipped
    // quantity, the threshold := half the part's total 1996 shipments.
    // The part-filtered fact join runs ONCE: a single per-(part,supp)
    // aggregate emits the all-time sum AND the 1996-only slice as a
    // conditional sum; the per-part 1996 total is then a window over
    // the already-tiny pair frame (the q61/Q18 single-aggregate
    // pattern — never aggregate the fact join twice). `tot96 > 0`
    // replicates the old inner-join semantics exactly: a part appears
    // in the 1996 total iff it shipped in 1996, and quantities are ≥1
    // so presence ⟺ positive sum. Pairs beating the threshold mark
    // their supplier (DISTINCT + semi-join — each EXISTS is exactly
    // one join); the one-nation filter prunes the supplier probe side
    // first. Integer-exact threshold by cross-multiplication:
    // 2*avail > tot96.
    "q97_tpch_q20" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val parts = Tables.part(s, dir).where(col("p_name").like("small%"))
        .select("p_partkey")
      val lp = l.join(parts, l("l_partkey") === parts("p_partkey"))
      val pairs = lp
        .groupBy(col("l_partkey").as("ap"), col("l_suppkey").as("asup"))
        .agg(
          sum(expr("cast(round(l_quantity) as bigint)")).cast("long").as("availqty"),
          sum(when(
            col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01",
            expr("cast(round(l_quantity) as bigint)")).otherwise(0L))
            .cast("long").as("qty96"))
      val marked = pairs
        .withColumn("tot96", sum(col("qty96")).over(Window.partitionBy(col("ap"))))
        .where(expr("tot96 > 0 AND 2 * availqty > tot96"))
        .select(col("asup")).distinct()
      Tables.supplier(s, dir)
        .where(col("s_nationkey") === 3)
        .join(marked, col("s_suppkey") === col("asup"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q2 min-cost-supplier adapted (no partsupp): the
    // supplier-part relationship comes from lineitem (the q95/q97
    // stand-in) and "supply cost" := the pair's cheapest observed line
    // total in exact cents (MIN of round(l_extendedprice*100)) — real
    // per-pair variation without a partsupp table. The correlated
    // scalar subquery ("cost = MIN cost among this part's region
    // suppliers") is a window MIN over the already part+region-filtered
    // pair frame, so the fact aggregate runs once and everything after
    // it is tiny; the part sliver and region-supplier sliver broadcast
    // under AQE. Ties at the min are kept, as in Q2. The full sort key
    // is a total order (pairs are distinct), so LIMIT is deterministic.
    "q99_tpch_q2" -> ((s, dir) => {
      // part filter BELOW the pair aggregation (the q97/Q20 pattern):
      // the filter drops whole parts, so per-(pk, sk) minima are
      // unchanged for survivors — the part join prunes the fact BEFORE
      // the aggregate instead of aggregating all pairs and discarding
      // most. `part` is SF-scaled, so the broadcast-or-shuffle call is
      // AQE's (no hint): broadcast at every test SF, shuffle at web
      // scale. p_brand rides the groupBy (functionally dependent on
      // pk), saving a second part join.
      val p = Tables.part(s, dir)
        .where(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select("p_partkey", "p_brand")
      val pairs = Tables.lineitem(s, dir)
        .join(p, col("l_partkey") === p("p_partkey"))
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
          col("p_partkey"), col("p_brand"))
        .agg(min(expr("cast(round(l_extendedprice * 100) as bigint)"))
          .cast("long").as("cost_cents"))
      val n = Tables.nation(s, dir).select("n_nationkey", "n_regionkey", "n_name")
      val r = Tables.region(s, dir).where(col("r_name") === "EUROPE")
        .select("r_regionkey")
      val esupp = Tables.supplier(s, dir)
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      pairs
        .join(esupp, col("sk") === col("s_suppkey"))
        .withColumn("mincost",
          min(col("cost_cents")).over(Window.partitionBy(col("pk"))))
        .where(col("cost_cents") === col("mincost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "cost_cents")
        .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q11 important-stock adapted (no partsupp): per-pair
    // available quantity AND unit-cost stand-ins both derive from
    // lineitem in ONE aggregate (availqty := all-time rounded shipped
    // quantity, q97's convention; cost := cheapest line total in
    // cents, q99's convention); stock value per part = sum(cost*qty)
    // over one nation's suppliers. The global threshold (0.1% of the
    // nation's total stock value) is a 1-row aggregate broadcast back
    // over the tiny per-part frame — integer-exact by
    // cross-multiplication (1000 * value > total), never a float
    // fraction.
    "q100_tpch_q11" -> ((s, dir) => {
      // nation semi-join BELOW the pair aggregation: it drops whole
      // suppliers (so whole pairs — per-pair minima/sums unchanged for
      // survivors), and pruning ~24/25 of fact rows before the pair
      // shuffle beats aggregating everything and discarding after.
      val natsupp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).where(col("n_name") === "NATION_9")
          .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      // natsupp is a 1/25 sliver of the SF-scaled supplier dim — still
      // growing with the corpus, so the semi-join is unhinted (AQE)
      val pairs = Tables.lineitem(s, dir)
        .join(natsupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(
          min(expr("cast(round(l_extendedprice * 100) as bigint)"))
            .cast("long").as("cost_cents"),
          sum(expr("cast(round(l_quantity) as bigint)")).cast("long").as("availqty"))
      val pv = pairs
        .groupBy(col("pk").as("p_partkey"))
        .agg(sum(col("cost_cents") * col("availqty")).cast("long").as("value_cents"))
      val total = pv.agg(sum(col("value_cents")).cast("long").as("tot"))
      pv.crossJoin(broadcast(total))
        .where(expr("1000 * value_cents > tot"))
        .select("p_partkey", "value_cents")
        .orderBy(desc("value_cents"), asc("p_partkey"))
    }),

    "q40_tpch_q3" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < "1998-03-15")
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > "1998-03-15")
      // customer is SF-scaled: no hard broadcast hint (AQE decides).
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("long").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    "q41_tpch_q5" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      // Hints only on nation/region (fixed 25/5 rows at every SF);
      // customer/supplier scale with SF — AQE picks broadcast when they
      // fit and shuffle join when they don't.
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("long").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),

    "q42_tpch_q6" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(sum(expr("cast(round(l_extendedprice * l_discount * 100) as bigint)"))
          .cast("long").as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    }),

    // Exact percentiles (linear interpolation — same rule both engines).
    "q43_percentiles" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("c", cents(col("o_totalprice")))
        .groupBy(col("o_orderstatus"))
        .agg(expr("cast(round(percentile(c, 0.5)) as bigint)").as("median_cents"),
             expr("cast(round(percentile(c, 0.9)) as bigint)").as("p90_cents"),
             count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // Pivot: event counts per day × type (fixed pivot values so both
    // engines emit identical columns).
    "q44_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("day", date_trunc("day", col("ts")))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    }),

    // String-distance + extraction functions (levenshtein, regexp
    // groups, translate) — fuzzy-matching surface for entity resolution.
    "q45_string_fns2" -> ((s, dir) => {
      Tables.part(s, dir).selectExpr(
        "p_partkey",
        "cast(levenshtein(p_brand, p_type) as bigint) AS lev_brand_type",
        "regexp_extract(p_name, '([a-z]+)', 1) AS first_word",
        "translate(p_brand, '#', '_') AS brand_t",
        "reverse(p_type) AS type_rev")
        .orderBy("p_partkey")
    }),

    // Cube: all grouping-set combinations with grouping id.
    "q46_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("g"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("g"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Approximate sketches (HLL distinct, quantile sketch). Sketch
    // INTERNALS are engine-specific, so the hash-checkable surface is
    // exact aggregates + within-bounds FLAGS: Spark emits the exact
    // answers alongside booleans asserting |approx − exact| ≤ ε·exact;
    // the DuckDB twin computes the same exact answers and literal TRUE.
    // A sketch drifting outside its documented error bound flips a flag
    // and fails the hash compare — the bound is verified end-to-end, not
    // just in a spec. ε = 10% against an HLL configured at 2% rsd and a
    // 1/1000-quantile sketch: generous enough to never flake, tight
    // enough that a broken sketch (or a wrong merge) trips it.
    "q47_sketches" -> ((s, dir) => {
      // exact median over INTEGER CENTS: interpolation then lands on .0
      // or .5 exactly, and ×2 makes it an exact integer — no FP-boundary
      // rounding hazard between engines (the raw-double median can sit a
      // half-ulp from a half-cent and round differently).
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
             expr("percentile(cast(round(l_extendedprice * 100) as bigint), 0.5)")
               .as("exact_median_cents"),
             expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"),
             count(lit(1)).as("n_rows"))
        .selectExpr(
          "l_returnflag",
          "n_parts",
          "cast(round(exact_median_cents * 2) as bigint) AS median_half_cents",
          "n_rows",
          "abs(approx_parts - n_parts) <= 0.1 * n_parts AS cd_within_bounds",
          "abs(approx_median * 100 - exact_median_cents) <= 0.1 * exact_median_cents AS med_within_bounds")
        .orderBy("l_returnflag")
    }),

    // Funnel: per-user signup→view→purchase stage flags + overall
    // conversion counts (conditional aggregation over event history).
    "q50_funnel" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "signup", 1).otherwise(0)).cast("long").as("has_signup"),
          max(when(col("event_type") === "view", 1).otherwise(0)).cast("long").as("has_view"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long").as("has_purchase"),
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L)).cast("long").as("purchase_cents"))
        .orderBy("user_id")
    }),

    // TPC-H Q10 shape (returned-item reporting): who returned the most
    // revenue last quarter — 4-way join, quarter filter, top-20.
    "q60_tpch_q10" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .where("o_orderdate >= cast('1996-01-01' as timestamp) AND " +
               "o_orderdate < cast('1996-04-01' as timestamp) AND l_returnflag = 'R'")
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .cast("long").as("revenue_cents"))
        .selectExpr("c_custkey", "c_name", "n_name",
          "cast(round(c_acctbal * 100) as bigint) AS acctbal_cents", "revenue_cents")
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape (large-volume customers): orders whose total
    // quantity clears a threshold. The textbook form is a grouped-HAVING
    // semi-join followed by a RE-aggregate of lineitem — but the HAVING
    // frame already carries each qualifying order's exact quantity sum
    // (the re-aggregate over all of that order's lines reproduces it
    // verbatim), so carrying `qty` through an INNER join needs ONE
    // lineitem aggregate instead of two and no second fact join: half
    // the fact shuffles for an identical result (round-6 rewrite; was
    // the slowest query in the round-6 bench at 3.05 s).
    "q61_tpch_q18" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .where("qty > 300")
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .selectExpr("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "cast(round(o_totalprice * 100) as bigint) AS totalprice_cents",
          "cast(round(qty) as bigint) AS sum_qty")
        .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
    }),

    // Event-time tumbling window (hourly) aggregation; exact value via e4 fixed point.
    "q17_hourly" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(round(col("value") * 10000).cast("long")).cast("long").as("value_e4"))
        .orderBy("hour", "event_type")
    })
  )

  def oracle: Map[String, String] = Map(
    "q01_dedup_group" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(round(SUM(l_quantity)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
        |  ORDER BY l_linenumber, l_suppkey, ROUND(l_quantity*100), ROUND(l_extendedprice*100), l_returnflag) AS rn FROM lineitem)
        |WHERE rn = 1 GROUP BY l_returnflag HAVING COUNT(*) > 10 ORDER BY l_returnflag""".stripMargin,
    "q02_keep_first" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_returnflag
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
        |  ORDER BY l_linenumber, l_suppkey, ROUND(l_quantity*100), ROUND(l_extendedprice*100), l_returnflag) AS rn FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey, l_partkey""".stripMargin,
    "q03_clean_na" ->
      """SELECT doc_id,
        |  CASE WHEN lang IS NULL OR lang = '' THEN 'NA' ELSE lang END AS lang_clean,
        |  CASE WHEN source IS NULL OR source = '' THEN 'NA' ELSE source END AS source_clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q04_project" ->
      """SELECT p_partkey AS object_id, p_name AS title, 'The MET Museum API' AS source,
        |  CAST(p_partkey AS VARCHAR) || '.jpg' AS filename
        |FROM part ORDER BY object_id""".stripMargin,
    "q05_filter" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type IN ('purchase','click') AND value > 50 AND props IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q06_join_agg" ->
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q09_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q10_collect" ->
      """SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1 ORDER BY o_custkey""".stripMargin,
    "q11_having" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5 ORDER BY o_custkey""".stripMargin,
    "q12_split" ->
      """SELECT CASE WHEN ((o_orderkey % 1000000007) * 2654435761 + 40503) % 10000 < 6400 THEN 'train'
        |            WHEN ((o_orderkey % 1000000007) * 2654435761 + 40503) % 10000 < 8000 THEN 'validation'
        |            ELSE 'test' END AS split,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1 ORDER BY split""".stripMargin,
    "q13_json" ->
      """SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
    "q105_json_variant" ->
      """WITH j AS (
        |  SELECT event_id,
        |    '{"meta":' || props || ',"type":"' || event_type || '","cents":' ||
        |    CAST(ROUND(value * 100) AS BIGINT) || '}' AS doc
        |  FROM events)
        |SELECT event_id,
        |  CAST(json_extract_string(doc, '$.meta.k') AS BIGINT) AS k,
        |  json_extract_string(doc, '$.type') AS etype,
        |  CAST(json_extract_string(doc, '$.cents') AS BIGINT) AS cents
        |FROM j
        |WHERE CAST(json_extract_string(doc, '$.meta.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
    "q15_union" ->
      """SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows FROM (
        |  SELECT 'high' AS bucket FROM orders WHERE o_totalprice >= 200000
        |  UNION ALL
        |  SELECT 'low' AS bucket FROM orders WHERE o_totalprice < 200000)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q16_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q14_scalar" ->
      """SELECT o_orderkey,
        |  printf('%08d', o_orderkey) AS pad8,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  upper(substr(o_orderpriority, 1, 3)) AS pri3,
        |  CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_at,
        |  lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS cust10,
        |  replace(o_orderstatus, 'O', 'OPEN') AS status_long
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q31_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  coalesce(lag(CAST(ROUND(o_totalprice*100) AS BIGINT), 1) OVER w, -1) AS prev_cents,
        |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q32_setops" ->
      """WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice >= 300000),
        |lo AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice < 100000)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM hi INTERSECT SELECT o_custkey FROM lo)
        |UNION ALL
        |SELECT 'only_high' AS tag, o_custkey FROM (SELECT o_custkey FROM hi EXCEPT SELECT o_custkey FROM lo)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q33_distinct_agg" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q34_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS g,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q35_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |s AS (
        |  SELECT user_id,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM f)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin,
    "q72_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |  CAST(SUM(base_c) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(disc_c) AS BIGINT) AS sum_disc_cents,
        |  CAST(SUM(charge_c) AS BIGINT) AS sum_charge_cents,
        |  (100 * CAST(SUM(qty) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS avg_qty_e2,
        |  CAST(SUM(base_c) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avg_base_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity) AS BIGINT) AS qty,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS base_c,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS disc_c,
        |    CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT) AS charge_c
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q80_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q81_tpch_q21" ->
      """WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |multi AS (SELECT l_orderkey FROM pairs GROUP BY l_orderkey HAVING COUNT(*) >= 2),
        |returned AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        |sole AS (
        |  SELECT r.l_orderkey, r.l_suppkey FROM returned r
        |  WHERE r.l_orderkey IN (SELECT l_orderkey FROM multi)
        |    AND NOT EXISTS (SELECT 1 FROM returned o
        |                    WHERE o.l_orderkey = r.l_orderkey AND o.l_suppkey <> r.l_suppkey))
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM sole JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,

    "q82_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
        |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q83_tpch_q8" ->
      """SELECT yr, nation_cents, total_cents,
        |  nation_cents * 1000000 // total_cents AS share_e6
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
        |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS nation_cents,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
        |  GROUP BY yr)
        |ORDER BY yr""".stripMargin,

    "q84_tpch_q14" ->
      """SELECT mo, promo_cents, total_cents,
        |  promo_cents * 1000000 // total_cents AS promo_e6
        |FROM (
        |  SELECT CAST(month(l_shipdate) AS BIGINT) AS mo,
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY mo)
        |ORDER BY mo""".stripMargin,

    "q87_tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q88_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q89_tpch_q17" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qsum,
        |    CAST(COUNT(*) AS BIGINT) AS qn
        |  FROM lineitem GROUP BY 1)
        |SELECT total_cents, n_rows, total_cents // n_rows AS avg_cents FROM (
        |  SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM lineitem JOIN part ON l_partkey = p_partkey JOIN pa ON l_partkey = pk
        |  WHERE p_brand = 'Brand#1'
        |    AND 2 * CAST(round(l_quantity) AS BIGINT) * qn < qsum)""".stripMargin,

    "q90_tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q91_tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)),
        |thr AS (
        |  SELECT CAST(SUM(bal_cents) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS thr
        |  FROM c WHERE c_acctbal > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
        |  CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM c, thr
        |WHERE bal_cents > thr
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin,

    "q94_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q95_tpch_q16" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |kept AS (
        |  SELECT l_partkey, l_suppkey FROM pairs
        |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM kept JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q96_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |       - CAST(round(p_retailprice * 60) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY n_name, yr ORDER BY nation, yr DESC""".stripMargin,

    "q97_tpch_q20" ->
      """WITH parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
        |avail AS (
        |  SELECT l_partkey AS ap, l_suppkey AS asup,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS availqty
        |  FROM lineitem JOIN parts ON l_partkey = p_partkey
        |  GROUP BY ap, asup),
        |total96 AS (
        |  SELECT l_partkey AS tp,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS tot96
        |  FROM lineitem JOIN parts ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY tp)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey = 3
        |  AND s_suppkey IN (
        |    SELECT asup FROM avail JOIN total96 ON ap = tp
        |    WHERE 2 * availqty > tot96)
        |ORDER BY s_suppkey""".stripMargin,

    "q99_tpch_q2" ->
      """WITH pairs AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY pk, sk),
        |esupp AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |ep AS (
        |  SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, cost_cents,
        |    MIN(cost_cents) OVER (PARTITION BY p_partkey) AS mincost
        |  FROM pairs JOIN esupp ON sk = s_suppkey
        |  JOIN part ON pk = p_partkey
        |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost_cents
        |FROM ep WHERE cost_cents = mincost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q100_tpch_q11" ->
      """WITH pairs AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS availqty
        |  FROM lineitem GROUP BY pk, sk),
        |pv AS (
        |  SELECT pk AS p_partkey, CAST(SUM(cost_cents * availqty) AS BIGINT) AS value_cents
        |  FROM pairs
        |  WHERE sk IN (SELECT s_suppkey FROM supplier JOIN nation
        |               ON s_nationkey = n_nationkey WHERE n_name = 'NATION_9')
        |  GROUP BY pk)
        |SELECT p_partkey, value_cents FROM pv
        |WHERE 1000 * value_cents > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM pv)
        |ORDER BY value_cents DESC, p_partkey""".stripMargin,

    "q40_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q41_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q42_tpch_q6" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q39_topk_per_group" ->
      """SELECT event_type, CAST(rnk AS BIGINT) AS rnk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
        |  FROM events) WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,
    "q43_percentiles" ->
      """SELECT o_orderstatus,
        |  CAST(round(quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5)) AS BIGINT) AS median_cents,
        |  CAST(round(quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.9)) AS BIGINT) AS p90_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q44_pivot" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q45_string_fns2" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev_brand_type,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  translate(p_brand, '#', '_') AS brand_t,
        |  reverse(p_type) AS type_rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q46_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS g,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // q47: exact aggregates + literal TRUE bound flags — the hash compare
    // then verifies Spark's sketch error bounds end-to-end (a drifting
    // sketch flips a Spark-side flag and mismatches). quantile_cont over
    // integer cents interpolates to .0/.5 exactly; ×2 = exact integer.
    "q47_sketches" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) * 2) AS BIGINT) AS median_half_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  TRUE AS cd_within_bounds,
        |  TRUE AS med_within_bounds
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q60_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND o_orderdate < CAST('1996-04-01' AS TIMESTAMP)
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "q61_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |  CAST(round(SUM(l_quantity)) AS BIGINT) AS sum_qty
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY totalprice_cents DESC, o_orderkey""".stripMargin,
    "q50_funnel" ->
      """SELECT user_id,
        |  CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS has_signup,
        |  CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS has_view,
        |  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS has_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q17_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*10000) AS BIGINT)) AS BIGINT) AS value_e4
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin
  )
}
