package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata structs.
  *
  * The Spark-side plumbing — schema, partitioning, UDF signatures, batch
  * shape — is real and tested. Image decode is real (JDK ImageIO, see
  * [[ImageOps]]). Audio/video codecs are NOT available in this container,
  * so `sampleFrames`/`audioFeatures` run a clearly-marked DETERMINISTIC
  * STUB behind the same signature a real decoder would have (swap the
  * function body, keep the plan shape).
  *
  * Scale notes: media bytes never reach the driver; per-row blobs are
  * capped by the GridFS chunking layer (Chunking.split) before shuffle;
  * feature extraction is a narrow map, so the only shuffles are whatever
  * the caller's aggregation needs.
  */
object Multimodal {

  /** Media-row schema: (media_id long, kind string, data binary,
    * meta struct). Canonical column order for every multimodal op. */
  val MetaFields: Seq[String] = Seq("width", "height", "sample_rate", "duration_ms", "n_channels")

  /** Real image metadata extraction: (width, height) from the encoded
    * bytes via ImageIO; nulls for undecodable. */
  val imageMeta: UserDefinedFunction =
    udf((b: Array[Byte]) => ImageOps.imageDimsOf(b))

  /** STUB (no video codec in-container): deterministic fake frame
    * sampler. Emits `duration_ms / everyMs` pseudo-frames, each an
    * md5-derived 16-byte payload of (media content hash, frame index) —
    * so downstream plumbing (explode, per-frame features, partitioning)
    * is exercised with stable bytes. A real implementation decodes and
    * samples actual frames behind this exact signature. */
  def sampleFramesStub(everyMs: Int): UserDefinedFunction =
    udf((data: Array[Byte], durationMs: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val contentHash = md.digest(data)
      val n = math.max(0L, durationMs / everyMs).toInt
      (0 until n).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
        d.update(contentHash)
        d.update(BigInt(i).toByteArray)
        d.digest()
      }
    })

  /** Audio features over raw bytes interpreted as signed 8-bit PCM —
    * real arithmetic (mean amplitude, RMS, zero crossings), stub only in
    * the sense that a real pipeline would decode the codec first. */
  val audioFeatures: UserDefinedFunction =
    udf((b: Array[Byte]) => {
      if (b == null || b.isEmpty) null
      else {
        var sum = 0.0; var sq = 0.0; var zc = 0
        var i = 0
        while (i < b.length) {
          val v = b(i).toDouble
          sum += v; sq += v * v
          if (i > 0 && ((b(i - 1) < 0) != (b(i) < 0))) zc += 1
          i += 1
        }
        (sum / b.length, math.sqrt(sq / b.length), zc)
      }
    })

  /** Image resize through the real ImageOps transform (224×224 JPEG). */
  val resizeImage: UserDefinedFunction = ImageOps.transformImage

  /** Assemble a typed media table from raw blobs: attaches kind-specific
    * metadata and hash id; repartitions by media_id so downstream
    * per-media ops are co-located. */
  def mediaTable(raw: DataFrame, partitions: Int = 0): DataFrame = {
    val withMeta = raw
      // id over (kind, duration, content): content-hash alone collides
      // when the same bytes appear under two kinds/durations
      .withColumn("media_id", xxhash64(col("kind"), col("duration_ms"), col("data")))
      .withColumn("img_meta", when(col("kind") === "image", imageMeta(col("data"))))
      .withColumn("meta", struct(
        col("img_meta._1").as("width"),
        col("img_meta._2").as("height"),
        when(col("kind") === "audio", lit(8000)).as("sample_rate"),
        col("duration_ms"),
        when(col("kind") === "audio", lit(1)).as("n_channels")))
      .drop("img_meta")
    if (partitions > 0) withMeta.repartition(partitions, col("media_id")) else withMeta
  }

  /** Per-frame feature rows from video blobs: explode sampled frames,
    * compute per-frame features — the batch shape a real video pipeline
    * uses (narrow map → explode → feature UDF). */
  def videoFrameFeatures(media: DataFrame, everyMs: Int = 1000): DataFrame =
    media.where(col("kind") === "video")
      .withColumn("frames", sampleFramesStub(everyMs)(col("data"), col("meta.duration_ms")))
      .select(col("media_id"), posexplode(col("frames")))
      .toDF("media_id", "frame_idx", "frame")
      .withColumn("f", audioFeatures(col("frame")))
      .select(col("media_id"), col("frame_idx"),
        col("f._1").as("mean_amp"), col("f._2").as("rms"), col("f._3").as("zero_crossings"))

  // ---------------------------------------------------------------- query
  // Not SQL-expressible (binary + UDFs) ⇒ registered without an oracle
  // twin; the driver records a rows-only check (SparkEntry contract).

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_media_meta" -> ((s, dir) => {
      import s.implicits._
      // deterministic in-memory media fixture (no media in testdata);
      // sfDir is unused by construction — documents supply stable blobs
      val docs = Tables.documents(s, dir).limit(8)
        .selectExpr("doc_id", "cast(text as binary) AS data")
      val imgs = Seq(
        ("image", ImageOps.makeTestJpeg(64, 48, 1), 0L),
        ("image", ImageOps.makeTestJpeg(320, 240, 2), 0L)
      ).toDF("kind", "data", "duration_ms")
      val audio = docs.selectExpr("'audio' AS kind", "data", "cast(2000 as long) AS duration_ms")
      val video = docs.selectExpr("'video' AS kind", "data", "cast(5000 as long) AS duration_ms")
      mediaTable(imgs.unionByName(audio).unionByName(video))
        .select("media_id", "kind", "meta.width", "meta.height", "meta.duration_ms")
        .orderBy("kind", "media_id")
    })
  )
}
