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
  // The media BYTES aren't SQL-expressible, but the typed-metadata
  // surface IS fully deterministic: the planted JPEGs have known
  // dimensions (really decoded via ImageIO — the oracle checks the
  // decode), and the doc-derived audio/video rows carry fixed
  // durations/rates. Projecting the portable metadata columns (media_id
  // stays internal — it's engine-native xxhash64) makes q30 fully
  // hash-checkable against a VALUES-literal DuckDB twin.

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_media_meta" -> ((s, dir) => {
      import s.implicits._
      // deterministic in-memory media fixture (no media in testdata);
      // documents supply stable blobs for the non-image kinds
      val docs = Tables.documents(s, dir).limit(8)
        .selectExpr("doc_id", "cast(text as binary) AS data")
      val imgs = Seq(
        ("image", ImageOps.makeTestJpeg(64, 48, 1), 0L),
        ("image", ImageOps.makeTestJpeg(320, 240, 2), 0L)
      ).toDF("kind", "data", "duration_ms")
      val audio = docs.selectExpr("'audio' AS kind", "data", "cast(2000 as long) AS duration_ms")
      val video = docs.selectExpr("'video' AS kind", "data", "cast(5000 as long) AS duration_ms")
      mediaTable(imgs.unionByName(audio).unionByName(video))
        .selectExpr("kind", "meta.width AS width", "meta.height AS height",
          "meta.sample_rate AS sample_rate", "meta.duration_ms AS duration_ms",
          "meta.n_channels AS n_channels")
        .orderBy("kind", "duration_ms", "width")
    })
  )

  /** DuckDB twin of q30: the expected metadata rows as literals — 2
    * planted JPEGs whose dims the REAL ImageIO decode must reproduce,
    * 8 audio + 8 video rows with the fixture's fixed durations. */
  def oracle: Map[String, String] = {
    val audioRows = Seq.fill(8)(
      "('audio', CAST(NULL AS INT), CAST(NULL AS INT), 8000, CAST(2000 AS BIGINT), 1)")
    val imageRows = Seq(
      "('image', 64, 48, CAST(NULL AS INT), CAST(0 AS BIGINT), CAST(NULL AS INT))",
      "('image', 320, 240, CAST(NULL AS INT), CAST(0 AS BIGINT), CAST(NULL AS INT))")
    val videoRows = Seq.fill(8)(
      "('video', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT), CAST(5000 AS BIGINT), CAST(NULL AS INT))")
    Map(
      "q30_media_meta" ->
        s"""SELECT kind, width, height, sample_rate, duration_ms, n_channels FROM (VALUES
           |  ${(audioRows ++ imageRows ++ videoRows).mkString(",\n  ")}
           |) AS t(kind, width, height, sample_rate, duration_ms, n_channels)
           |ORDER BY kind, duration_ms, width""".stripMargin)
  }
}
