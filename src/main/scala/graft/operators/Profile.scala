package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling — the data-quality pass every production corpus runs
  * before training (row counts, null rates, distinct counts, value
  * ranges per column; the Deequ/Great-Expectations shape, reference has
  * nothing comparable because it never validates its inputs).
  *
  * Scale posture: ONE aggregate pass over the table computes every
  * statistic for every profiled column simultaneously — count/min/max
  * are plain partial aggregates; the exact multi-column COUNT(DISTINCT)
  * is Spark's Expand strategy (rows ×(columns+1) map-side, each branch
  * partial-aggregated before the single shuffle), the standard exact
  * answer. At 100 TB swap exact ndv for approx_count_distinct (same
  * plan minus Expand) — kept exact here because the DuckDB oracle
  * hash-compares values. The 1×stats row then unpivots via stack() into
  * one row per column — driver-scale, after aggregation.
  *
  * All extrema are reported ×100 as BIGINT (`*_e2`) so double columns
  * hash identically across engines (same trick as Relational.cents).
  */
object Profile {

  private case class Col(name: String, expr: String)

  /** lineitem's numeric surface: key, fk, and the two money/qty doubles. */
  private val cols = Seq(
    Col("l_orderkey", "l_orderkey"),
    Col("l_suppkey", "l_suppkey"),
    Col("l_quantity", "l_quantity"),
    Col("l_extendedprice", "l_extendedprice"))

  def profile(li: DataFrame): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c.expr)).as(s"n_${c.name}"),
        countDistinct(col(c.expr)).as(s"ndv_${c.name}"),
        round(min(col(c.expr)) * 100).cast("long").as(s"min_${c.name}"),
        round(max(col(c.expr)) * 100).cast("long").as(s"max_${c.name}"))
    }
    val total = count(lit(1)).as("n_rows")
    val one = li.agg(total, aggs: _*)
    val stackArgs = cols.map { c =>
      s"'${c.name}', n_rows - n_${c.name}, ndv_${c.name}, min_${c.name}, max_${c.name}"
    }.mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, ndv, min_e2, max_e2)")
      .selectExpr("col_name", "cast(n_rows as bigint) AS n_rows",
        "cast(n_null as bigint) AS n_null", "cast(ndv as bigint) AS ndv",
        "min_e2", "max_e2")
      .orderBy("col_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_profile" -> ((s, dir) => profile(Tables.lineitem(s, dir))))

  def oracle: Map[String, String] = {
    val branches = cols.map { c =>
      s"""SELECT '${c.name}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT(${c.expr}) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT ${c.expr}) AS BIGINT) AS ndv,
         |  CAST(ROUND(MIN(${c.expr}) * 100) AS BIGINT) AS min_e2,
         |  CAST(ROUND(MAX(${c.expr}) * 100) AS BIGINT) AS max_e2
         |FROM lineitem""".stripMargin
    }
    Map("q106_profile" -> (branches.mkString("\n", "\nUNION ALL\n", "\n") + "ORDER BY col_name"))
  }
}
