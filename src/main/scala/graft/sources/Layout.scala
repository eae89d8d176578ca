package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-dimensional data layout: Z-order (Morton) clustering for scan
  * pruning.
  *
  * A 100 TB table is read through its file/row-group min-max statistics;
  * a LINEAR sort makes them selective in exactly one dimension. Morton
  * interleaving maps points on a space-filling curve, so sorting by the
  * code makes every file a small hyper-rectangle — min/max stats become
  * selective in EVERY interleaved dimension at once, and a typical
  * two-predicate query (user ∧ value, time ∧ key) skips the same large
  * fraction of files it would have skipped with a dedicated sort per
  * dimension. This is the standard lakehouse layout lever (the same
  * trick behind Delta/Iceberg Z-ORDER clustering), expressed here as a
  * pure column expression + a range-partitioned sorted write — nothing
  * engine-private.
  *
  * The interleave is pure int64 bit arithmetic spelled identically in
  * Spark SQL and DuckDB (`>>`, `&`, `<<` — both parse it verbatim), so
  * the code computation itself is oracle-checked (q77). */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative int
    * expressions: x occupies even bit positions, y odd. Identical text
    * is valid in both Spark SQL and DuckDB. */
  def mortonE(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Clamp an int64 expression into [0, 2^bits): the quantization guard
    * both engines share (greatest/least exist verbatim in both). */
  def clampE(e: String, bits: Int = 16): String =
    s"least(${(1L << bits) - 1}, greatest(0, $e))" // plain int literals: valid in BOTH dialects (no L suffix in DuckDB)

  /** Write `df` clustered on the Morton code of two dimensions:
    * normalize each dimension to the full 16-bit range over its
    * OBSERVED min/max (the classic z-order requirement — with raw
    * values, the dimension with more magnitude bits owns every high
    * bit of the code and the other dimension never clusters), then
    * range-partition into `nFiles` code ranges (one output file each),
    * sort within partitions, drop the helper column. Each file then
    * covers a tight rectangle in (x, y) space — the written parquet
    * footers do the pruning from there.
    *
    * Cost: one tiny min/max agg (driver gets 4 longs) + one range
    * exchange (sampled boundaries) — the same single-shuffle cost a
    * linear `orderBy` write pays. Extents up to ~2^47 stay exact
    * ((v−min)·65535 must fit in int64). */
  def zorderWrite(df: DataFrame, xE: String, yE: String, path: String,
                  nFiles: Int = 8): Unit = {
    val b = df.selectExpr(s"cast(min($xE) as bigint)", s"cast(max($xE) as bigint)",
      s"cast(min($yE) as bigint)", s"cast(max($yE) as bigint)").head()
    if (b.isNullAt(0)) { // empty input: nothing to cluster, write as-is
      df.write.mode("overwrite").parquet(path); return
    }
    def norm(e: String, lo: Long, hi: Long): String =
      s"((($e) - $lo) * 65535) div ${math.max(1L, hi - lo)}"
    df.withColumn("__z", expr(mortonE(
        clampE(norm(xE, b.getLong(0), b.getLong(1))),
        clampE(norm(yE, b.getLong(2), b.getLong(3))))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  // ---------------------------------------------------------------- queries

  /** Quantizers for the events table: user_id is already a small
    * nonnegative int; value maps to integer cents. Shared by the query,
    * the oracle, and the layout spec. */
  private[graft] val userQ = "user_id"
  private[graft] val valueQ = "cast(round(value * 100) as bigint)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The Morton code itself, oracle-checked bit for bit: the column a
    // z-ordered write clusters on (and proof the layout key is
    // engine-independent).
    "q77_zorder" -> ((s, dir) =>
      Tables.events(s, dir)
        .selectExpr("event_id",
          s"${mortonE(clampE(userQ), clampE(valueQ))} AS zval")
        .orderBy("event_id"))
  )

  def oracle: Map[String, String] = Map(
    "q77_zorder" ->
      s"""SELECT event_id, ${mortonE(clampE("user_id"), clampE("CAST(round(value * 100) AS BIGINT)"))} AS zval
         |FROM events ORDER BY event_id""".stripMargin
  )
}
