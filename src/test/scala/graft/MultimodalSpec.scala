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

  test("aHash: variants stay within the banding guarantee, unrelated images stay far, bad bytes null") {
    import graft.functions.Multimodal
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = (1 to 5).map(i =>
      ImageOps.makeBlockJpeg(64 + 16 * i, 48 + 12 * i, i))
    val hashes = base.map(b => Multimodal.aHash64(b).longValue)
    // resize+re-encode and exact copies sit INSIDE the 4-band pigeonhole
    // radius (<= 3), so the banded join cannot miss them
    base.zip(hashes).foreach { case (b, h) =>
      val tf = Multimodal.aHash64(ImageOps.transformImageBytes(b)).longValue
      assert(ham(h, tf) <= 3, s"variant drifted: ${ham(h, tf)} bits")
      assert(ham(h, Multimodal.aHash64(b).longValue) == 0)
    }
    // unrelated images are far outside the confirm radius
    for (i <- hashes.indices; j <- hashes.indices if i < j)
      assert(ham(hashes(i), hashes(j)) > 20,
        s"seeds $i/$j too close: ${ham(hashes(i), hashes(j))}")
    assert(Multimodal.aHash64(Array[Byte](1, 2, 3)) == null)
    // hash is resolution-invariant for block content: the SAME seed
    // rendered at a different size maps to (nearly) the same cells
    val other = ImageOps.makeBlockJpeg(200, 152, 1)
    assert(ham(hashes(0), Multimodal.aHash64(other).longValue) <= 3)
  }

  test("band combos guarantee radius 3 in both regimes; wide regime catches cross-band flips") {
    import graft.functions.Multimodal
    val small = Multimodal.bandCombos(100L)
    val wide = Multimodal.bandCombos(1L << 20)
    assert(small.size == 4 && wide.size == 56)
    // pigeonhole property, exhaustively: EVERY 3-dirty-block pattern
    // leaves some chosen subset entirely clean — in both regimes
    for (combos <- Seq(small, wide); dirty <- (0 to 7).combinations(3))
      assert(combos.exists(c => c.forall(b => !dirty.contains(b))),
        s"dirty=$dirty escapes ${combos.size}-combo family")
    // a Hamming-3 pair with flips in THREE DIFFERENT blocks is caught
    // by the banded join in both regimes (guarantee, not luck)
    import spark.implicits._
    val h = 0x0123456789abcdefL
    val flipped = h ^ (1L << 1) ^ (1L << 17) ^ (1L << 62) // blocks 0, 2, 7
    val frame = Seq(("a", h), ("b", flipped), ("c", ~h)).toDF("img_key", "h")
    for (n <- Seq(100L, 1L << 20)) {
      val pairs = Multimodal.confirmedPairs(frame, frame, maxHamming = 3,
        nHint = Some(n)).as[(String, String)].collect().toSet
      assert(pairs == Set(("a", "b")), s"regime n=$n found $pairs")
    }
  }

  test("image dedup keeps sources, drops their variants, never driver-collects the bytes") {
    import spark.implicits._
    val out = graft.functions.Multimodal
      .imageDedup(graft.functions.Multimodal.imageFixtureRows.toDF("img_key", "data"))
      .as[(String, Long, Boolean)].collect()
      .map { case (k, n, kp) => k -> ((n, kp)) }.toMap
    assert(!out.contains("img9_bad"), "undecodable blob must be dropped")
    assert(out("img1") == (1L, true) && out("img1_resized") == (1L, false))
    assert(out("img2") == (1L, true) && out("img2_resized") == (1L, false))
    assert(out("img3") == (1L, true) && out("img3_copy") == (1L, false))
    assert(out("img4") == (0L, true) && out("img5") == (0L, true))
  }

  test("pHash catches the planted caption pair aHash misses; families agree elsewhere") {
    import spark.implicits._
    val rows = Multimodal.pHashFixtureRows
    val byKey = rows.toMap
    // the raw asymmetry, measured: the caption overlay scatters the
    // aHash cells past the confirm radius (the mean moved under them)
    // while the DCT block stays within it
    def ham(a: java.lang.Long, b: java.lang.Long) =
      java.lang.Long.bitCount(a.longValue ^ b.longValue)
    val aHam = ham(Multimodal.aHash64(byKey("img5")), Multimodal.aHash64(byKey("img5_caption")))
    val pHam = ham(Multimodal.pHash64(byKey("img5")), Multimodal.pHash64(byKey("img5_caption")))
    assert(aHam > 10, s"caption pair unexpectedly inside aHash confirm radius ($aHam)")
    assert(pHam <= 10, s"caption pair outside pHash confirm radius ($pHam)")

    // and through the full pipelines: aHash keeps the caption variant
    // as a distinct image, pHash pairs and drops it
    def decisions(d: org.apache.spark.sql.DataFrame) =
      d.as[(String, Long, Boolean)].collect().map { case (k, n, kp) => k -> ((n, kp)) }.toMap
    val a = decisions(Multimodal.imageDedup(rows.toDF("img_key", "data")))
    val p = decisions(Multimodal.imageDedupPHash(rows.toDF("img_key", "data")))
    assert(a("img5_caption") == (0L, true) && a("img5") == (0L, true),
      "aHash must miss the caption pair (the blind spot under test)")
    assert(p("img5_caption") == (1L, false) && p("img5") == (1L, true),
      "pHash must confirm the caption pair and keep-first the source")
    // the families agree on every non-planted decision
    val common = (a.keySet intersect p.keySet) - "img5" - "img5_caption"
    common.foreach(k => assert(a(k) == p(k), s"families disagree on $k: ${a(k)} vs ${p(k)}"))

    // pHash brightness invariance by construction: a uniform shift
    // moves only the DC coefficient
    val shifted = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(byKey("img4")))
      val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        def c(v: Int) = math.min(255, v + 25)
        out.setRGB(x, y, (c((rgb >> 16) & 0xFF) << 16) | (c((rgb >> 8) & 0xFF) << 8) | c(rgb & 0xFF))
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "jpeg", baos); baos.toByteArray
    }
    assert(ham(Multimodal.pHash64(byKey("img4")), Multimodal.pHash64(shifted)) <= 3,
      "pHash must be stable under a uniform brightness shift")
  }

  test("cross-modal gate: swapped captions caught, correct pairs pass, margins wide") {
    import spark.implicits._
    val rows = Multimodal.crossModalFixtureRows
    val scores = Multimodal.crossModalScores(
        rows.toDF("pair_key", "data", "caption"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val correct = scores.filter(!_._1.endsWith("_swapped")).values
    val swapped = scores.filter(_._1.endsWith("_swapped")).values
    assert(correct.size == 5 && swapped.size == 2)
    // decisions (what the q207 oracle pins) ...
    assert(correct.forall(_ >= 500000L), s"correct pair under threshold: $scores")
    assert(swapped.forall(_ < 500000L), s"swapped pair over threshold: $scores")
    // ... and MARGINS: both sides sit far from the cut, so the one
    // double step (the normalized cosine) cannot flip a decision on
    // codec or ulp wobble — the q171 decisions-not-bits discipline
    assert(correct.min >= 900000L,
      s"correct-pair margin too thin: $scores")
    assert(swapped.max <= 300000L,
      s"swapped-pair margin too thin: $scores")
    // an explicitly planted swap on the SAME pair ids: exchanging two
    // correct captions must flip both decisions
    val base = rows.filter(r => r._1 == "pair2" || r._1 == "pair3")
    val crossed = Seq(
      ("pair2", base(0)._2, base(1)._3),
      ("pair3", base(1)._2, base(0)._3))
    val flipped = Multimodal.crossModalGate(
        crossed.toDF("pair_key", "data", "caption"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(flipped == Map("pair2" -> false, "pair3" -> false),
      s"swapping captions between pair2/pair3 must fail both: $flipped")
    // undecodable bytes drop (F6 semantics), never score
    val bad = Multimodal.crossModalGate(
        Seq(("bad", Array[Byte](1, 2, 3), "luma 0 0")).toDF("pair_key", "data", "caption"))
      .collect()
    assert(bad.isEmpty)
  }

  test("text tower embeds free-form captions; alien/empty text fails deterministically") {
    import spark.implicits._
    // the de-circularized tower (r17 verdict Next #5): a caption that is
    // NOT stub-formatted embeds without error through the generic
    // hashed-BoW kernel, and one sharing no visual words with the image
    // deterministically FAILS the gate (false, never NULL — the r17
    // ADVICE malformed-caption leak)
    val img = graft.functions.ImageOps.makeBlockJpeg(96, 72, 11)
    val rows = Seq(
      ("freeform", img, "a museum photograph of an amphora on display"),
      ("empty", img, ""),
      ("nullish", img, null.asInstanceOf[String]),
      ("own", img, Multimodal.captionOf(img)))
    val out = Multimodal.crossModalGate(rows.toDF("pair_key", "data", "caption"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("freeform" -> false, "empty" -> false,
      "nullish" -> false, "own" -> true), s"gate decisions: $out")
    // and the fixture generator itself follows the family's null
    // convention on undecodable bytes (the r17 ADVICE NPE)
    assert(Multimodal.captionOf(Array[Byte](9, 9, 9)) == null)
  }
}
