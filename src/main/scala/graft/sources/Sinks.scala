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

  /** Small-file compaction (the standing lakehouse maintenance op): a
    * streaming/incremental writer leaves thousands of KB-sized files,
    * and at 100 TB the scan's task-scheduling overhead and footer reads
    * come to dominate. Rewrite the dataset into
    * ceil(totalBytes / targetBytes) files and atomically swap
    * directories (write to `<path>.__compact`, then rename) so readers
    * never observe a half-written layout.
    *
    * Size comes from the file system, not a data scan; the rewrite is
    * one job with no shuffle (`coalesce`, not `repartition` — merging
    * partitions needs no exchange). Returns (filesBefore, filesAfter). */
  def compactSmallFiles(spark: SparkSession, path: String,
                        targetBytes: Long = 128L << 20): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: String) = fs.listStatus(new Path(p))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(path)
    if (before.isEmpty) return (0, 0) // nothing to compact
    val total = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = path + ".__compact"
    spark.read.parquet(path).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val afterCount = dataFiles(tmp).length
    // Swap via rename-aside, not delete-then-rename: deleting the live
    // directory first opens a window where readers see a missing path,
    // and a failed rename would leave ONLY the .__compact copy. Renames
    // are metadata-only on HDFS-like filesystems; the old copy is
    // deleted last, after the new layout is live, so a crash at any
    // point leaves a complete dataset at `path` or at `path.__old`.
    val old = new Path(path + ".__old")
    fs.delete(old, true) // clear any leftover from a prior crashed swap
    require(fs.rename(new Path(path), old),
      s"compaction aside-rename failed for $path")
    if (!fs.rename(new Path(tmp), new Path(path))) {
      fs.rename(old, new Path(path)) // restore the original layout
      throw new IllegalStateException(s"compaction rename failed for $path")
    }
    fs.delete(old, true)
    (before.length, afterCount)
  }
}
