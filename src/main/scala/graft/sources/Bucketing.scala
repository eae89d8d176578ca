package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout management — the "pay the shuffle once" lever
  * for fact-to-fact joins at scale.
  *
  * A join between two tables bucketed AND sorted by the join key needs
  * neither exchange nor sort at read time: each task zips bucket i of
  * one table with bucket i of the other. At 100 TB that turns every
  * recurring orderkey join from a full-cluster shuffle into a
  * map-only stage — the single biggest cost lever a warehouse layout
  * owns. BucketingSpec proves the property on real TPC-H tables by
  * counting exchanges in the executed plan (zero).
  *
  * Bucket-count rule of thumb at scale: total_size / bucket_count ≈
  * 128–512 MB per bucket per table; both sides MUST use the same count
  * (Spark does not coalesce mismatched bucket counts without an
  * exchange).
  *
  * Exchange elision is unconditional; SORT elision additionally needs
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — Spark
  * stopped trusting bucket sortedness by default because a bucket
  * split across files is only per-file sorted. [[writeBucketed]]
  * guarantees one file per bucket, the exact case the flag is safe
  * for. */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted by `key`.
    *
    * The repartition before the write is load-bearing: bucket id and
    * `repartition(n, col)` use the same HashPartitioning, so it lands
    * each bucket's rows in exactly ONE task → ONE file per bucket.
    * Spark's scan only elides the read-side sort when a bucket is a
    * single file (per-file sortedness is all sortBy guarantees);
    * multi-file buckets silently reintroduce a SortExec per side. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Read a bucketed table back (by name, from the session catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
