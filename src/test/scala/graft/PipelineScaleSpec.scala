package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageOps
import graft.pipeline.MuseumPipeline

/** Volume smoke for the museum pipeline: 200 artworks (10% duplicate
  * object_ids, a few bad rows) through the full E1→E2 path — the fixture
  * suite proves branch coverage; this proves the pipeline holds together
  * beyond toy row counts. */
class PipelineScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val n = 200

  lazy val objects = {
    val rows = (0 until n).map { i =>
      val oid = if (i % 10 == 9) (i - 1) + 1000L else i + 1000L // every 10th duplicates its predecessor
      (oid, s"Artwork $i", if (i % 7 == 0) null else s"Artist ${i % 23}",
        s"Dept ${i % 5}", if (i % 11 == 0) "" else s"Culture ${i % 13}",
        s"Period ${i % 6}", s"${1800 + i % 200}", s"Medium ${i % 4}",
        s"http://img/$i.jpg", 200)
    }
    rows.toDF("objectID", "title", "artistDisplayName", "department",
      "culture", "period", "objectDate", "medium", "primaryImage", "status")
  }

  lazy val images = (0 until n).map { i =>
    (s"http://img/$i.jpg",
      if (i % 50 == 37) Array.fill[Byte](100)(1) // a few undecodable
      else ImageOps.makeTestJpeg(120 + i % 60, 90 + i % 40, i),
      200)
  }.toDF("url", "bytes", "status")

  lazy val out = MuseumPipeline.run(spark, objects, images, maxDownloads = n)

  test("200-artwork run: dedup, clean, transform and split hold at volume") {
    val meta = out("artwork_metadata").cache()
    val expectedDistinct = n - n / 10 // every 10th row collapsed into its predecessor
    assert(meta.count() == expectedDistinct)
    assert(meta.groupBy("object_id").count().filter(col("count") > 1).count() == 0)
    assert(meta.filter(col("culture").isNull || col("culture") === "").count() == 0) // C1 applied
    assert(meta.filter(col("split").isNull).count() == 0)
    // files bucket matches surviving metadata 1:1
    assert(out("fs_files").count() == expectedDistinct)
  }

  test("200-artwork run: every decodable image produced a 224x224 transformed file") {
    val meta = out("artwork_metadata")
    val transformed = meta.filter(col("transformed_gridfs_file_id").isNotNull).count()
    val failed = meta.filter(col("transformed_gridfs_file_id").isNull).count()
    assert(transformed + failed == meta.count())
    assert(failed >= 1 && failed <= 8, s"expected only the undecodable few, got $failed")
    assert(out("fs_transformed_files").count() == transformed)
    // sample three blobs structurally
    val sample = graft.operators.Chunking.reassemble(out("fs_transformed_chunks")).limit(3).collect()
    sample.foreach { r =>
      assert(ImageOps.imageDimsOf(r.getAs[Array[Byte]]("data")).contains((224, 224)))
    }
  }
}
