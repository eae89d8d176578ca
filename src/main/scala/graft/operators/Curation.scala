package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Corpus-curation operators for training-data assembly: deterministic
  * downsampling and mixture allocation — the two knobs a pretraining
  * pipeline turns between "raw crawl" and "training mix".
  *
  * Both are expression-only and integer-exact, so they are fully
  * DuckDB-oracle-checkable, and both are narrow/grouped shapes that hold
  * at 100 TB:
  *  - sampling is a per-row hash predicate (no shuffle at all);
  *  - allocation aggregates to ONE row per source before any window
  *    touches it (the windows run over #sources rows, not data).
  */
object Curation {

  /** Deterministic stratified sampling: keep a per-stratum fraction,
    * decided by the PORTABLE hash of the document id — reproducible
    * across engines, runs, and partitionings (`rand()` would be none of
    * those). Strata here are length buckets (short docs are usually
    * over-represented in crawls); `rates` maps stratum → keep-percent. */
  def stratifiedSample(docs: DataFrame,
                       rates: Map[String, Int] = Map("long" -> 100, "mid" -> 50, "short" -> 25)): DataFrame = {
    val stratum =
      "CASE WHEN length(text) >= 2000 THEN 'long' WHEN length(text) >= 500 THEN 'mid' ELSE 'short' END"
    val keep = rates.toSeq.sortBy(_._1)
      .map { case (s, pct) => s"(stratum = '$s' AND h100 < $pct)" }
      .mkString(" OR ")
    docs
      .selectExpr("doc_id", s"$stratum AS stratum",
        s"pmod(${sparkHash48("cast(doc_id as string)")}, 100) AS h100")
      .where(keep)
  }

  /** Training-mix allocation via the largest-remainder method: split a
    * fixed sequence `budget` across sources proportionally to their
    * token counts, exactly (allocations sum to the budget; every source
    * is within 1 of its exact proportional share). All int64 arithmetic:
    * quota = (budget·tokens) div total, and the `budget − Σquota`
    * leftover goes to the largest remainders (ties → smaller source id).
    */
  def mixtureAllocation(docs: DataFrame, budget: Long = 10000L,
                        sources: Int = 5): DataFrame = {
    val perSource = docs
      .selectExpr(s"doc_id % $sources AS source", s"cast(size($sparkToks) as bigint) AS n")
      .groupBy("source").agg(sum("n").as("n_tokens"))
    // windows run over `sources` rows (the aggregated mix table), never
    // over the corpus — this is a driver-scale table kept distributed
    val all = Window.partitionBy(lit(0))
    val byRem = Window.partitionBy(lit(0))
      .orderBy(col("rem").desc, col("source"))
    perSource
      .withColumn("total", sum("n_tokens").over(all))
      .withColumn("quota", expr(s"($budget * n_tokens) div total"))
      .withColumn("rem", expr(s"($budget * n_tokens) % total"))
      .withColumn("leftover", lit(budget) - sum("quota").over(all))
      .withColumn("rk", row_number().over(byRem))
      .selectExpr("source", "n_tokens",
        "quota + if(rk <= leftover, 1, 0) AS alloc")
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_stratified_sample" -> ((s, dir) =>
      stratifiedSample(Tables.documents(s, dir)).orderBy("doc_id")),

    "q58_mixture_alloc" -> ((s, dir) =>
      mixtureAllocation(Tables.documents(s, dir)).orderBy("source"))
  )

  def oracle: Map[String, String] = Map(
    "q57_stratified_sample" ->
      s"""SELECT doc_id, stratum, h100 FROM (
         |  SELECT doc_id,
         |    CASE WHEN length(text) >= 2000 THEN 'long'
         |         WHEN length(text) >= 500 THEN 'mid' ELSE 'short' END AS stratum,
         |    ${duckHash48("CAST(doc_id AS VARCHAR)")} % 100 AS h100
         |  FROM documents)
         |WHERE (stratum = 'long' AND h100 < 100)
         |   OR (stratum = 'mid' AND h100 < 50)
         |   OR (stratum = 'short' AND h100 < 25)
         |ORDER BY doc_id""".stripMargin,

    "q58_mixture_alloc" ->
      """WITH per_source AS (
        |  SELECT doc_id % 5 AS source,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |q AS (
        |  SELECT source, n_tokens,
        |    CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
        |  FROM per_source),
        |a AS (
        |  SELECT source, n_tokens,
        |    (10000 * n_tokens) // total AS quota,
        |    (10000 * n_tokens) % total AS rem
        |  FROM q),
        |r AS (
        |  SELECT *,
        |    CAST(10000 - SUM(quota) OVER () AS BIGINT) AS leftover,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM a)
        |SELECT source, n_tokens,
        |  CAST(quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY source""".stripMargin
  )
}
