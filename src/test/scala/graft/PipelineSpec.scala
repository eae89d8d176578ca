package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageOps
import graft.pipeline.{Fixtures, MuseumPipeline}

/** Golden end-to-end replay of the reference pipeline on FIXTURES.md §A
  * fixtures (SURVEY.md §5.3): filters, clean, dedup, image transform,
  * GridFS buckets, split — with the structural (not byte-level) image
  * assertions decided in SURVEY §7.4. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val out = MuseumPipeline.run(spark, Fixtures.metObjects(spark), Fixtures.images(spark))
  lazy val meta = out("artwork_metadata").cache()

  test("ingest filters drop non-200, empty/null primaryImage, failed fetch") {
    // 104 (""), 105 (null), 106 (404), 109 (fetch 500) never enter metadata
    val ids = meta.select("object_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(104L) && !ids.contains(105L) && !ids.contains(106L) && !ids.contains(109L))
    assert(ids.contains(101L) && ids.contains(102L) && ids.contains(103L) && ids.contains(110L))
  }

  test("dedup keeps exactly one row per object_id") {
    val counts = meta.groupBy("object_id").count().filter(col("count") > 1).count()
    assert(counts == 0)
  }

  test("clean maps null/empty cleanable fields to NA but not department/title") {
    val m101 = meta.filter(col("object_id") === 101L).collect()(0)
    assert(m101.getAs[String]("culture") == "NA")   // was null
    assert(m101.getAs[String]("period") == "NA")    // was ""
    val m103 = meta.filter(col("object_id") === 103L).collect()(0)
    assert(m103.getAs[String]("medium") == "NA")    // was ""
    assert(m103.getAs[String]("department") == null) // department NOT in fields_to_clean
  }

  test("source literal and filename format match the reference") {
    assert(meta.filter(col("source") =!= "The MET Museum API").count() == 0)
    val fn = out("fs_files").select("filename").collect().map(_.getString(0)).toSet
    assert(fn.contains("101.jpg") && fn.contains("103.jpg"))
    val tfn = out("fs_transformed_files").select("filename").collect().map(_.getString(0))
    assert(tfn.nonEmpty && tfn.forall(_.endsWith("_transformed.jpg")))
  }

  test("transformed images are 224x224 decodable JPEGs; undecodable input dropped (F6)") {
    val tChunks = out("fs_transformed_chunks")
    val rebuilt = graft.operators.Chunking.reassemble(tChunks).collect()
    assert(rebuilt.nonEmpty)
    rebuilt.foreach { r =>
      val dims = ImageOps.imageDimsOf(r.getAs[Array[Byte]]("data"))
      assert(dims.contains((224, 224)), s"bad dims $dims")
    }
    // 110's garbage bytes must not yield a transformed file, and its
    // metadata row keeps a null lineage (row preserved, transform skipped)
    val m110 = meta.filter(col("object_id") === 110L).collect()(0)
    assert(m110.getAs[String]("transformed_gridfs_file_id") == null)
  }

  test("lineage: every successfully transformed row points at a transformed file") {
    val linked = meta.filter(col("transformed_gridfs_file_id").isNotNull)
    val tIds = out("fs_transformed_files").select(col("_id").as("tid"))
    assert(linked.join(tIds, col("transformed_gridfs_file_id") === col("tid"), "left_anti").count() == 0)
    assert(linked.count() == 3) // 101, 102, 103 (110 failed decode)
  }

  test("victims' raw files are deleted from the bucket (K4)") {
    // dups of 101/102 ingested as separate files; after dedup the bucket
    // must hold exactly one file per surviving metadata row
    val files = out("fs_files")
    assert(files.count() == meta.filter(col("gridfs_file_id").isNotNull).count())
    val orphanChunks = out("fs_chunks").join(
      files.select(col("_id").as("fid")), col("files_id") === col("fid"), "left_anti").count()
    assert(orphanChunks == 0)
  }

  test("multi-chunk raw image survives chunk/reassemble through the pipeline") {
    val big = out("fs_files").filter(col("length") > graft.operators.Chunking.GridFsChunkSize)
    assert(big.count() >= 1) // the 1200x900 fixture spans >1 chunk
  }

  test("split labels the whole table into the 64/16/20 partition") {
    assert(meta.filter(col("split").isNull).count() == 0)
    val labels = meta.select("split").collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "validation", "test")))
  }

  test("pipeline from file-backed sources (JSON objects + parquet blobs) matches in-memory run") {
    val dir = java.nio.file.Files.createTempDirectory("api_src").toString
    graft.sources.ApiSource.writeObjects(Fixtures.metObjects(spark), dir)
    graft.sources.ApiSource.writeImages(Fixtures.images(spark), dir)
    val fromFiles = MuseumPipeline.run(spark,
      graft.sources.ApiSource.readObjects(spark, dir),
      graft.sources.ApiSource.readImages(spark, dir))
    assert(fromFiles("artwork_metadata").count() == meta.count())
    assert(fromFiles("fs_files").count() == out("fs_files").count())
    assert(fromFiles("fs_transformed_files").count() == out("fs_transformed_files").count())
    val a = fromFiles("artwork_metadata").select("object_id", "title", "artist", "split").orderBy("object_id")
    val b = meta.select("object_id", "title", "artist", "split").orderBy("object_id")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("pipeline persists through the graft-store connector: metadata + both GridFS buckets round-trip") {
    import graft.operators.Chunking
    val names = Seq("artwork_metadata", "fs_files", "fs_chunks",
      "fs_transformed_files", "fs_transformed_chunks")
    // E1→E2 results land in the external store through the DSv2 write
    // path (driver-atomic two-phase commit), binary chunk columns included
    names.foreach { n =>
      out(n).write.format("graft-store").option("name", s"mus_$n")
        .mode("overwrite").save()
    }
    def readBack(n: String) =
      spark.read.format("graft-store").option("name", s"mus_$n").load()
    names.foreach { n =>
      assert(readBack(n).count() == out(n).count(),
        s"$n row count through the connector")
    }
    // byte fidelity: every chunk payload hashes identically after the
    // connector write + read (binary end-to-end, both buckets)
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .select(col("files_id"), col("n"), md5(col("data")).as("h"))
      .orderBy("files_id", "n").collect().toSeq
    assert(sig(readBack("fs_chunks")) == sig(out("fs_chunks")))
    assert(sig(readBack("fs_transformed_chunks")) == sig(out("fs_transformed_chunks")))
    // and the store-backed bucket reassembles to the same blobs (S5/J2
    // running entirely against the connector)
    def blobSig(df: org.apache.spark.sql.DataFrame) =
      Chunking.reassemble(df)
        .select(col("files_id"), md5(col("data")).as("h"))
        .orderBy("files_id").collect().toSeq
    val fromStore = blobSig(readBack("fs_transformed_chunks"))
    assert(fromStore == blobSig(out("fs_transformed_chunks")) && fromStore.nonEmpty)
  }

  test("transform is idempotent (F4): second run processes zero new rows") {
    val (again, tFiles2, _) = MuseumPipeline.transform(meta, out("fs_files"), out("fs_chunks"))
    assert(tFiles2.count() == 0) // everything already has lineage or failed decode... except 110 retries
    assert(again.count() == meta.count())
  }
}
