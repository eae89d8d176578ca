package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking
import graft.sources.{InMemoryStoreConnector, ParquetConnector, StorageConnector, TempViewConnector}

/** The storage seam: the same operator graph must run unchanged over any
  * [[StorageConnector]] implementation (SURVEY §7.1 — shaped so a
  * mongo-spark/GridFS connector drops in). */
class ConnectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** A small operator pipeline that only sees the connector. */
  private def roundTrip(c: StorageConnector): Long = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    c.write(docs, "docs_rt")
    val back = c.read(spark, "docs_rt")
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
    // GridFS bucket round trip: put → bucket → read → reassemble
    val blobs = docs.limit(50)
      .select(col("doc_id").cast("string").as("_id"),
        concat(col("doc_id"), lit(".txt")).as("filename"),
        col("text").as("data"))
    val (files, chunks) = Chunking.gridfsPut(blobs, size = 64)
    c.writeBucket(files, chunks, "fs_rt")
    val (filesBack, chunksBack) = c.readBucket(spark, "fs_rt")
    assert(filesBack.count() == 50)
    val rebuilt = Chunking.reassemble(chunksBack, zero = "''")
      .withColumnRenamed("files_id", "_id")
      .withColumnRenamed("data", "rebuilt")
    blobs.join(rebuilt, "_id").where(col("rebuilt") === col("data")).count()
  }

  test("parquet connector: table + GridFS bucket round trip") {
    val root = Files.createTempDirectory("pq_conn").toString
    assert(roundTrip(new ParquetConnector(root)) == 50)
  }

  test("temp-view connector: the same pipeline, storage-free") {
    assert(roundTrip(new TempViewConnector("spec")) == 50)
  }

  test("in-memory store connector: the same pipeline against a stateful external-store shape") {
    assert(roundTrip(new InMemoryStoreConnector) == 50)
  }

  test("DSv2 connector: the same pipeline through the full scan/commit protocol") {
    assert(roundTrip(new graft.sources.v2.GraftStoreV2Connector) == 50)
  }

  test("in-memory store connector: append ACCUMULATES across writes like a real collection") {
    val c = new InMemoryStoreConnector
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val first = docs.where("doc_id % 2 = 0")
    val second = docs.where("doc_id % 2 = 1")
    c.write(first, "acc", SaveMode.Append)   // append-to-new creates
    c.write(second, "acc", SaveMode.Append)  // append-to-existing inserts
    val back = c.read(spark, "acc")
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
    // bucket append: a second batch of files lands alongside the first
    val blobs = docs.limit(20)
      .select(col("doc_id").cast("string").as("_id"),
        concat(col("doc_id"), lit(".txt")).as("filename"),
        col("text").as("data"))
    val (f1, ch1) = Chunking.gridfsPut(blobs.where("_id < '15'"), size = 64)
    val (f2, ch2) = Chunking.gridfsPut(blobs.where("_id >= '15'"), size = 64)
    c.writeBucket(f1, ch1, "fs_acc", SaveMode.Append)
    c.writeBucket(f2, ch2, "fs_acc", SaveMode.Append)
    val (filesBack, chunksBack) = c.readBucket(spark, "fs_acc")
    assert(filesBack.count() == 20)
    val rebuilt = Chunking.reassemble(chunksBack, zero = "''")
      .withColumnRenamed("files_id", "_id").withColumnRenamed("data", "rebuilt")
    assert(blobs.join(rebuilt, "_id").where(col("rebuilt") === col("data")).count() == 20)
    // schema-checked appends + create-mode semantics
    intercept[IllegalArgumentException] {
      c.write(docs.select("doc_id"), "acc", SaveMode.Append)
    }
    intercept[IllegalStateException] {
      c.write(first, "acc", SaveMode.ErrorIfExists)
    }
    c.write(first, "acc", SaveMode.Ignore) // no-op on existing
    assert(c.read(spark, "acc").count() == docs.count())
  }

  test("temp-view connector rejects append") {
    val c = new TempViewConnector("spec2")
    val df = spark.range(3).toDF("id")
    intercept[UnsupportedOperationException] {
      c.write(df, "t", SaveMode.Append)
    }
  }

  test("Tables reads through the connector seam unchanged") {
    // the default connector must produce exactly what the queries consume
    val viaTables = Tables.documents(spark, sf)
    val direct = new ParquetConnector(sf).read(spark, "documents")
    assert(viaTables.schema == direct.schema)
    assert(viaTables.count() == direct.count())
  }
}
