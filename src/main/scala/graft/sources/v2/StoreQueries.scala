package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-backed queries exercising the `graft-store` DSv2 connector
  * end-to-end: the documents table is ingested into the external-store
  * stand-in, then read back THROUGH the connector (zone-map segment
  * pruning + claimed filters + column pruning all on the scan path) and
  * aggregated. The DuckDB twin runs over the parquet source directly —
  * a hash match proves the connector is a faithful storage layer, not
  * just a row pump. */
object StoreQueries {

  /** Idempotent per-(sfDir) ingest: the store is an external system, so
    * load once per dataset like a fixture server would be. */
  private val loaded = scala.collection.mutable.Set.empty[String]
  private def ensureLoaded(spark: SparkSession, sfDir: String): String = {
    val name = "documents_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    loaded.synchronized {
      if (!loaded.contains(name)) {
        GraftStore.load(name, Tables.documents(spark, sfDir),
          shardKey = Some("doc_id"), numSegments = 8)
        loaded += name
      }
    }
    name
  }

  /** Disk-backed twin of [[ensureLoaded]]: the DISTRIBUTED ingest path
    * (executors write range-partitioned parquet; the driver reads only
    * footers — zero rows materialize driver-side), so the correctness
    * gate exercises the payload mode that scales past driver RAM. */
  private def ensureDisk(spark: SparkSession, sfDir: String): String = {
    val name = "documents_disk_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    loaded.synchronized {
      if (!loaded.contains(name)) {
        val dir = java.nio.file.Files.createTempDirectory("graft_disk_q").toString
        GraftStore.loadDisk(name, Tables.documents(spark, sfDir),
          shardKey = "doc_id", numSegments = 8, dir = dir)
        loaded += name
      }
    }
    name
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4 through the DSv2 surface: claimed range filter (doc_id — the
    // shard key, so zone maps prune segments) + claimed n_chars filter
    // + column pruning down to (lang, source, n_chars), then a
    // partial-agg rollup. The plan's BatchScan shows the pushed filters.
    "q73_dsv2_scan" -> ((s, dir) => {
      val name = ensureLoaded(s, dir)
      s.read.format("graft-store").option("name", name).load()
        .where(col("doc_id") >= 100 && col("n_chars") >= 200)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("chars"))
        .orderBy("lang", "source")
    }),

    // Complete aggregate pushdown: COUNT(*)/MIN/MAX answered from the
    // store's zone maps and segment counts — zero rows deserialized
    // (GraftSourceSpec proves the counters stay at 0). The oracle
    // recomputes the same aggregates from the raw parquet, so a hash
    // match proves the METADATA is consistent with the data.
    "q85_dsv2_agg" -> ((s, dir) => {
      val name = ensureLoaded(s, dir)
      s.read.format("graft-store").option("name", name).load()
        .agg(count(lit(1)).as("n_rows"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
    }),

    // Storage-partitioned join: documents and per-language stats both
    // live in the store CLUSTERED on lang, the scans report
    // KeyGroupedPartitioning(identity(lang)), and the join plans with
    // zero pre-join exchanges (GraftSourceSpec proves shuffles == 0
    // with broadcast disabled). "Docs longer than their language's
    // average" — the join is row-level, so a wrong alignment would be
    // oracle-visible immediately.
    // Requires spark.sql.sources.v2.bucketing.enabled=true, set in the
    // HARNESS session builders (Verify/Bench/Explain) and the spec's
    // conf scope — not here: a conf set inside a query closure would
    // silently change join planning for every later query in the session.
    "q92_spj_join" -> ((s, dir) => {
      val (docsName, statsName) = ensureClustered(s, dir)
      val d = s.read.format("graft-store").option("name", docsName).load()
      val st = s.read.format("graft-store").option("name", statsName).load()
      d.join(st, "lang")
        .where(col("n_chars") > col("avg_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_above"),
          sum("n_chars").cast("long").as("chars_above"),
          max("avg_chars").as("avg_chars"))
        .orderBy("lang")
    }),

    // SQL views over the catalog ([[GraftViews]]): two stacked CREATE OR
    // REPLACE VIEWs — a row-filter view over the store collection, a
    // rollup view over THAT — then a SELECT from the top view. The
    // DuckDB twin inlines the view bodies, so a hash match proves view
    // expansion is semantically invisible (a pure driver-side plan
    // splice: the store scan under two view layers still sees the
    // pushed filter and prunes segments by zone map). Requires
    // spark.sql.extensions=graft.plans.GraftExtensions, set in the
    // harness session builders (Verify/Bench/Explain — extensions are
    // build-time static conf, not settable from inside a query).
    // S4 through the DISK-BACKED connector: same scan shape as q73 but
    // the collection's rows live in parquet segment files the executors
    // stream (zone maps from file footers, zero driver-side rows at
    // ingest). A hash match against the same DuckDB twin as q73 proves
    // the two payload modes are indistinguishable to a query.
    "q102_disk_scan" -> ((s, dir) => {
      val name = ensureDisk(s, dir)
      s.read.format("graft-store").option("name", name).load()
        .where(col("doc_id") >= 100 && col("n_chars") >= 200)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("chars"))
        .orderBy("lang", "source")
    }),

    // Change data feed from time travel: ingest documents (generation
    // 1), run three SQL DML batches against the catalog (UPDATE /
    // DELETE / INSERT — each a new MVCC generation), then diff
    // `VERSION AS OF` 1 against the current generation with
    // [[graft.operators.Diff.snapshotDiff]]. The DuckDB twin derives
    // the identical change set symbolically from the mutation
    // predicates over the raw parquet — a hash match proves the whole
    // stack end-to-end: DML correctness, generation isolation (v1 is
    // untouched by three later commits), and the diff operator.
    "q119_snapshot_diff" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
      val name = ensureCdf(s, dir)
      def snap(v: String) = s.sql(
        s"SELECT doc_id, lang, n_chars FROM graft_cat.`$name` $v")
      graft.operators.Diff.snapshotDiff(
          snap("VERSION AS OF 1"), snap(""), "doc_id")
        .orderBy("doc_id", "change_type")
    }),

    // Incremental view maintenance composed end-to-end on real storage:
    // the per-lang COUNT/SUM view is aggregated ONCE from `VERSION AS
    // OF 1`, the q119 change feed is derived from time travel, and
    // Diff.maintainGroupedAgg applies the feed's additive deltas to the
    // old view state — the current table is NEVER re-aggregated. The
    // DuckDB twin aggregates the post-mutation state directly, so the
    // hash match proves maintained ≡ recomputed.
    // Materialized view end-to-end: full aggregate at creation, pure
    // tail append, APPEND-path incremental refresh (enforced), read
    // back through the connector. Oracle = grouped agg over the whole
    // table.
    "q149_matview_refresh" -> ((s, dir) => {
      val mv = ensureMatView(s, dir)
      GraftMatViews.read(s, mv)
        .selectExpr("lang", "n AS n_docs", "v AS chars").orderBy("lang")
    }),

    "q122_incremental_agg" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
      val name = ensureCdf(s, dir)
      def snap(v: String) = s.sql(
        s"SELECT doc_id, lang, n_chars FROM graft_cat.`$name` $v")
      val base = snap("VERSION AS OF 1").groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("v"))
      val changes = graft.operators.Diff
        .snapshotDiff(snap("VERSION AS OF 1"), snap(""), "doc_id")
        .select("change_type", "lang", "n_chars")
      graft.operators.Diff.maintainGroupedAgg(base, changes, "lang", "n_chars")
        .selectExpr("lang", "n AS n_docs", "v AS chars")
        .orderBy("lang")
    }),

    "q101_view_sql" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
      val name = ensureLoaded(s, dir)
      s.sql(s"""CREATE OR REPLACE VIEW graft_cat.vws.long_docs AS
                |SELECT lang, source, n_chars FROM graft_cat.`$name`
                |WHERE n_chars >= 500""".stripMargin)
      s.sql("""CREATE OR REPLACE VIEW graft_cat.vws.lang_rollup AS
              |SELECT lang, COUNT(*) AS n_docs,
              |  CAST(SUM(n_chars) AS BIGINT) AS chars
              |FROM graft_cat.vws.long_docs GROUP BY lang""".stripMargin)
      s.sql("SELECT lang, n_docs, chars FROM graft_cat.vws.lang_rollup ORDER BY lang")
    })
  )

  /** Materialized-view fixture (q149): the leading 80% of documents
    * (by doc_id) ingested DISK-backed as the MV's base, the MV created
    * (full aggregate, version pinned), then the remaining 20% appended
    * as a pure tail and the MV refreshed. The refresh is REQUIRED to
    * take the append fast path — only the new tail segments are read;
    * a fallback to diff/recompute fails the query loudly rather than
    * passing on a technicality. The oracle aggregates the WHOLE
    * documents table: a hash match proves create ∘ append ∘ refresh ≡
    * full re-aggregation. (`GraftStore.append(rows)` is the dev
    * connector's driver-side API — the distributed form is the SQL
    * INSERT exercised in GraftCatalogSpec; the refresh path under test
    * is identical for both.) */
  private def ensureMatView(spark: SparkSession, sfDir: String): String = {
    val suffix = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val mv = "mv_lang_" + suffix
    loaded.synchronized {
      if (!loaded.contains(mv)) {
        val base = "docs_mvbase_" + suffix
        val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
        val maxId = docs.agg(max("doc_id")).head().getLong(0)
        val cut = maxId - maxId / 5
        val dir = java.nio.file.Files.createTempDirectory("graft_mv_q").toString
        GraftStore.loadDisk(base, docs.where(s"doc_id < $cut"), "doc_id", 8, dir)
        GraftMatViews.create(spark, mv, base, "doc_id", "lang", "n_chars")
        GraftStore.append(base, docs.schema,
          docs.where(s"doc_id >= $cut").collect().toSeq)
        val r = GraftMatViews.refresh(spark, mv)
        require(r.mode == "append",
          s"q149 expected the append fast path, got ${r.mode}")
        loaded += mv
      }
    }
    mv
  }

  /** CDF fixture: documents ingested (generation 1), then exactly one
    * UPDATE + DELETE + INSERT round applied through the SQL catalog.
    * The mutation predicates are pure residue classes of doc_id so the
    * DuckDB twin can replay them symbolically. Idempotent per
    * (sfDir) like the other store fixtures — Bench reps and Verify
    * share the mutated collection, and `VERSION AS OF 1` pins the
    * pre-image regardless of how many times the query re-runs. */
  private def ensureCdf(spark: SparkSession, sfDir: String): String = {
    val name = "documents_cdf_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    loaded.synchronized {
      if (!loaded.contains(name)) {
        GraftStore.load(name, Tables.documents(spark, sfDir),
          shardKey = Some("doc_id"), numSegments = 8)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
        spark.sql(s"UPDATE graft_cat.`$name` SET n_chars = n_chars + 1000 " +
          "WHERE doc_id % 37 = 3")
        spark.sql(s"DELETE FROM graft_cat.`$name` WHERE doc_id % 31 = 5")
        Tables.documents(spark, sfDir).createOrReplaceTempView("__cdf_src")
        spark.sql(s"INSERT INTO graft_cat.`$name` " +
          "SELECT doc_id + 10000000, text, lang, source, n_chars + 7 " +
          "FROM __cdf_src WHERE doc_id % 101 = 11")
        loaded += name
      }
    }
    name
  }

  private def ensureClustered(spark: SparkSession, sfDir: String): (String, String) = {
    val suffix = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val (dn, sn) = ("documents_by_lang_" + suffix, "lang_stats_" + suffix)
    loaded.synchronized {
      if (!loaded.contains(dn)) {
        val docs = Tables.documents(spark, sfDir)
        GraftStore.loadClustered(dn, docs, "lang")
        GraftStore.loadClustered(sn, docs.groupBy("lang")
          .agg(expr("sum(n_chars) div count(1)").as("avg_chars")), "lang")
        loaded += dn
      }
    }
    (dn, sn)
  }

  def oracle: Map[String, String] = Map(
    "q73_dsv2_scan" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE doc_id >= 100 AND n_chars >= 200
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q85_dsv2_agg" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars, CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM documents""".stripMargin,
    "q92_spj_join" ->
      """WITH stats AS (
        |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avg_chars
        |  FROM documents GROUP BY lang)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_above,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS chars_above,
        |  CAST(MAX(s.avg_chars) AS BIGINT) AS avg_chars
        |FROM documents d JOIN stats s ON d.lang = s.lang
        |WHERE d.n_chars > s.avg_chars
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q102_disk_scan" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE doc_id >= 100 AND n_chars >= 200
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // create ∘ append ∘ incremental-refresh ≡ full re-aggregation
    "q149_matview_refresh" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q119_snapshot_diff" ->
      """SELECT doc_id, 'delete' AS change_type, lang, n_chars
        |FROM documents WHERE doc_id % 31 = 5
        |UNION ALL
        |SELECT doc_id + 10000000, 'insert', lang, n_chars + 7
        |FROM documents WHERE doc_id % 101 = 11
        |UNION ALL
        |SELECT doc_id, 'update_pre', lang, n_chars
        |FROM documents WHERE doc_id % 37 = 3 AND doc_id % 31 <> 5
        |UNION ALL
        |SELECT doc_id, 'update_post', lang, n_chars + 1000
        |FROM documents WHERE doc_id % 37 = 3 AND doc_id % 31 <> 5
        |ORDER BY doc_id, change_type""".stripMargin,

    "q122_incremental_agg" ->
      """WITH post AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 37 = 3 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 31 <> 5
        |  UNION ALL
        |  SELECT doc_id + 10000000, lang, n_chars + 7
        |  FROM documents WHERE doc_id % 101 = 11)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM post GROUP BY lang ORDER BY lang""".stripMargin,

    "q101_view_sql" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE n_chars >= 500
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
