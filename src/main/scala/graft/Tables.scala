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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (micros) refuses to read directly; read it as a long via the legacy
    * flag and truncate to micros. DuckDB keeps ns natively, so oracle
    * queries never emit a raw `ts` — only date_trunc'd buckets. */
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
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    eventsRaw(spark, sfDir).withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
