package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking
import graft.sources.{ParquetConnector, StorageConnector, TempViewConnector}

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
