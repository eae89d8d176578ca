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
    })
  )

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
        |FROM documents""".stripMargin
  )
}
