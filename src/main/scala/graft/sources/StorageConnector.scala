package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage seam (SURVEY.md §7.1; BASELINE north-star "DataFrame ETL +
  * GridFS connector"). Every operator in this library is a pure
  * `DataFrame => DataFrame` transform; only this trait touches storage.
  *
  * The reference reads/writes MongoDB collections and GridFS buckets
  * (/root/reference/src/ingestion.py:17-20). A mongo-spark connector
  * implementation maps 1:1 onto this surface:
  *  - `read`/`write`      → `spark.read/write.format("mongodb")
  *                           .option("collection", name)`
  *  - `readBucket`        → the bucket's `<name>.files` / `<name>.chunks`
  *                           collections (the GridFS wire layout that
  *                           [[graft.operators.Chunking]] reproduces)
  *  - `writeBucket`       → bulk-insert of both collections
  *
  * The default [[ParquetConnector]] emulates that layout as parquet
  * directories — the right call in the zero-egress environment, and the
  * scan stays fully declarative so Catalyst pushes filters and prunes
  * columns regardless of implementation. */
trait StorageConnector {

  /** Read the named collection/table. Implementations must return a lazy
    * scan (no driver-side materialization) so pushdown survives. */
  def read(spark: SparkSession, name: String): DataFrame

  /** Bulk-write `df` as the named collection/table. */
  def write(df: DataFrame, name: String, mode: SaveMode = SaveMode.Overwrite): Unit

  /** Read a GridFS-shaped bucket: (files catalog, chunk rows). */
  def readBucket(spark: SparkSession, bucket: String): (DataFrame, DataFrame) =
    (read(spark, s"$bucket.files"), read(spark, s"$bucket.chunks"))

  /** Write a GridFS-shaped bucket (the two-table output of
    * [[graft.operators.Chunking.gridfsPut]]). */
  def writeBucket(files: DataFrame, chunks: DataFrame, bucket: String,
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    write(files, s"$bucket.files", mode)
    write(chunks, s"$bucket.chunks", mode)
  }
}

/** Parquet-directory connector: `name` ↔ `<root>/<name>.parquet`. The
  * default implementation everywhere (TESTDATA.md layout). */
class ParquetConnector(root: String) extends StorageConnector {
  override def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(s"$root/$name.parquet")
  override def write(df: DataFrame, name: String, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(s"$root/$name.parquet")
}

/** In-process stateful store with REAL append semantics — the third
  * implementation, exercising the external-store API shape a
  * mongo-spark/GridFS connector has (a stateful server that accumulates
  * inserts across writes, unlike a file overwrite or a view swap):
  *  - `Append`        → bulk-insert into the existing collection
  *                      (schema-checked, like a typed collection)
  *  - `Overwrite`     → drop + insert
  *  - `ErrorIfExists` / `Ignore` → the usual create semantics
  *
  * Rows live in a driver-side map — this is the TEST/DEV stand-in for a
  * real server (the store itself is external state, not Spark data; a
  * real connector keeps the same call contract and streams partitions
  * instead of collecting). `read` returns a LocalRelation over the
  * current contents, so the operator graph above the seam is unchanged. */
class InMemoryStoreConnector extends StorageConnector {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.StructType
  import scala.jdk.CollectionConverters._

  private val store =
    scala.collection.mutable.Map.empty[String, (StructType, Vector[Row])]

  override def read(spark: SparkSession, name: String): DataFrame =
    store.synchronized(store.get(name)) match {
      case Some((schema, rows)) => spark.createDataFrame(rows.asJava, schema)
      case None => throw new NoSuchElementException(s"no such collection: $name")
    }

  override def write(df: DataFrame, name: String, mode: SaveMode): Unit = {
    val rows = df.collect().toVector // the store IS the driver-side state
    store.synchronized {
      (mode, store.get(name)) match {
        case (SaveMode.Overwrite, _) => store(name) = (df.schema, rows)
        case (SaveMode.Append, Some((schema, old))) =>
          require(schema == df.schema,
            s"append schema mismatch for $name: $schema vs ${df.schema}")
          store(name) = (schema, old ++ rows)
        case (SaveMode.Append, None) => store(name) = (df.schema, rows)
        case (SaveMode.ErrorIfExists, Some(_)) =>
          throw new IllegalStateException(s"collection exists: $name")
        case (SaveMode.ErrorIfExists, None) => store(name) = (df.schema, rows)
        case (SaveMode.Ignore, Some(_)) => ()
        case (SaveMode.Ignore, None) => store(name) = (df.schema, rows)
      }
    }
  }
}

/** Session-catalog connector: collections live as temp views — a second,
  * storage-free implementation proving operators are connector-agnostic
  * (and a handy shape for tests and notebook sessions). Temp views have
  * no append semantics; only Overwrite/ErrorIfExists are supported. */
class TempViewConnector(prefix: String = "graft") extends StorageConnector {
  private def viewName(name: String): String =
    prefix + "_" + name.replaceAll("[^A-Za-z0-9_]", "_")
  override def read(spark: SparkSession, name: String): DataFrame =
    spark.table(viewName(name))
  override def write(df: DataFrame, name: String, mode: SaveMode): Unit = mode match {
    case SaveMode.Overwrite => df.createOrReplaceTempView(viewName(name))
    case SaveMode.ErrorIfExists => df.createTempView(viewName(name))
    case other => throw new UnsupportedOperationException(
      s"TempViewConnector supports Overwrite/ErrorIfExists, not $other")
  }
}
