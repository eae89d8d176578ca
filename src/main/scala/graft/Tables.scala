package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{ParquetConnector, StorageConnector}

/** Loaders for the driver's TPC-H-ish parquet testdata (see TESTDATA.md).
  *
  * Every operator in this library is a pure `DataFrame => DataFrame`
  * transform; storage is reached only through
  * [[graft.sources.StorageConnector]] (default: parquet), so swapping in
  * a real connector (e.g. MongoDB/GridFS, as the reference uses —
  * /root/reference/src/ingestion.py:17-20) replaces one factory method.
  * Scans stay fully declarative so Catalyst pushes filters and prunes
  * columns into the reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The connector for a data directory — the single swap point. */
  def connector(sfDir: String): StorageConnector = new ParquetConnector(sfDir)

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else connector(sfDir).read(spark, name)

  /** `events.ts` has shipped with different physical parquet types across
    * testdata generations: TIMESTAMP(NANOS) (Spark refuses → read as long
    * via the legacy flag, truncate to micros), plain timestamp[us] with no
    * timezone (loads as TIMESTAMP_NTZ), or timestamp[us] with UTC
    * (TimestampType). The legacy flag is harmless for non-nanos files, so
    * always set it, then adapt on the loaded Catalyst type. The session
    * timezone is UTC, so NTZ→TZ cast preserves the instant exactly.
    * DuckDB-side oracles use date_trunc/epoch_us buckets, which agree on
    * micros data. */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    connector(sfDir).read(spark, "events")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    adaptEventsTs(eventsRaw(spark, sfDir))

  /** Normalize whatever physical encoding this testdata generation uses
    * for `ts` to TimestampType (micros, UTC instant). Works on batch and
    * streaming DataFrames alike (dispatches on the Catalyst type only) —
    * streaming callers must declare the file's on-disk schema, then pass
    * the stream through here. */
  def adaptEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // NTZ→TZ cast interprets the wall-clock in the SESSION timezone;
        // the instant is preserved only under UTC. Every in-repo builder
        // pins UTC — fail loudly if a foreign caller didn't, instead of
        // silently shifting every event by its zone offset.
        val tz = raw.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"adaptEventsTs: TIMESTAMP_NTZ events require spark.sql.session.timeZone=UTC (got $tz)")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — extend Tables.adaptEventsTs for this testdata generation")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
