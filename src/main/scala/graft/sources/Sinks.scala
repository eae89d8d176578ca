package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink layer (SURVEY.md §2.2, K-family) — the reference's writes are
  * row-at-a-time Mongo inserts/updates; at scale they become bulk
  * columnar writes with layout control:
  *
  *  - partitioned writes: directory-partitioned parquet (partition
  *    pruning on read — the scan skips non-matching partitions entirely);
  *  - bucketed writes: hash-bucketed + sorted tables, so equi-joins and
  *    aggregations on the bucket key run with NO shuffle exchange
  *    (verified by SinksSpec asserting an Exchange-free join plan).
  *
  * At 100 TB the bucket count is sized to ~shuffle-partition granularity
  * (e.g. 4096); locally the specs use 8.
  */
object Sinks {

  /** Directory-partitioned parquet write (e.g. metadata by `split`,
    * events by day). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Hash-bucketed, per-bucket-sorted table write. Readers joining or
    * aggregating on `key` reuse the layout instead of shuffling. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a bucketed table by name. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
