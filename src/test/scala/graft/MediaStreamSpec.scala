package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal
import graft.streaming.MediaStream

/** Streamed perceptual image dedup gate: the maintained decision view
  * must be row-identical to batch imageDedup over every image seen so
  * far — across micro-batch splits, a mid-stream restart, and a planted
  * RETRO-DISPLACEMENT (a variant is kept until its smaller-keyed source
  * arrives in a LATER batch, then flips to dropped at read time). */
class MediaStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed image dedup equals batch across restart, with retro-displacement") {
    val all = Multimodal.imageFixtureRows
    val byKey = all.toMap
    def frame(keys: String*): DataFrame =
      keys.map(k => k -> byKey(k)).toDF("img_key", "data")

    val stage = Files.createTempDirectory("media_src").toString
    val state = Files.createTempDirectory("media_state").toString + "/state"
    val ckpt = Files.createTempDirectory("media_ckpt").toString

    def addFile(name: String, rows: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("media_tmp").toString
      rows.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(stage, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema(frame("img1").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
      val q = MediaStream.startImageDedup(stream, state, ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    def decisions(d: DataFrame): Map[String, (Long, Boolean)] =
      d.as[(String, Long, Boolean)].collect()
        .map { case (k, n, kp) => k -> ((n, kp)) }.toMap

    // variants arrive BEFORE their smaller-keyed sources
    addFile("b1.parquet", frame("img1_resized", "img3_copy", "img4"))
    addFile("b2.parquet", frame("img1", "img5", "img9_bad"))
    run() // crash point
    val mid = decisions(MediaStream.imageDedupView(spark, state))
    assert(!mid.contains("img9_bad"), "undecodable blob never enters the state")
    assert(mid("img3_copy") == ((0L, true)),
      "copy is KEPT while its source hasn't arrived")
    assert(mid("img1_resized") == ((1L, false)) && mid("img1") == ((1L, true)),
      "the smaller-keyed late arrival retro-displaces the variant")

    addFile("b3.parquet", frame("img2", "img2_resized", "img3"))
    run() // fresh query, same checkpoint

    val streamed = decisions(MediaStream.imageDedupView(spark, state))
    val batch = decisions(Multimodal.imageDedup(
      all.map { case (k, b) => k -> b }.toDF("img_key", "data")))
    assert(streamed == batch, s"stream/batch drift: $streamed vs $batch")
    assert(!streamed("img3_copy")._2, "retro-displacement landed after b3")
  }

  test("regime boundary: crossing the wide threshold re-confirms the store under the wide family") {
    // planted 64-bit hashes targeting band structure directly (pixels
    // can't aim at specific aHash bits, so this drives hashStepHashed):
    //  - pair A (k1, k2): Hamming 4, one flip in EACH of blocks 0..3 —
    //    narrow bands (4,5)/(6,7) stay clean (confirmed), but every
    //    wide 5-block subset touches a dirty block (NOT confirmed):
    //    the probabilistic tail where the two families disagree
    //  - pair B (k3, k4): Hamming 1 — guaranteed under BOTH families
    //  - k5, k6: unrelated (Hamming > 10 to everything)
    val h1 = 0L
    val h2 = (1L << 0) | (1L << 8) | (1L << 16) | (1L << 24)
    val h3 = 0xFFFF000000000000L
    val h4 = h3 ^ 1L
    val h5 = 0x0F0F0F0F0F0F0F0FL
    val h6 = 0xF0F0F0F0F0F0F0F0L
    val state = Files.createTempDirectory("media_regime").toString + "/state"
    val T = 4L
    def step(id: Long, rows: Seq[(String, Long)]): Unit =
      MediaStream.hashStepHashed(rows.toDF("img_key", "h"), id, state,
        maxHamming = 10, wideThreshold = T)
    def decisions(d: DataFrame): Map[String, (Long, Boolean)] =
      d.as[(String, Long, Boolean)].collect()
        .map { case (k, n, kp) => k -> ((n, kp)) }.toMap

    // batch 0: store = 4 <= T -> narrow regime; pair A is confirmed
    step(0L, Seq("k1" -> h1, "k2" -> h2, "k3" -> h3, "k4" -> h4))
    val narrowEra = decisions(MediaStream.imageDedupView(spark, state))
    assert(narrowEra("k2") == ((1L, false)) && narrowEra("k4") == ((1L, false)),
      s"narrow era should confirm both pairs: $narrowEra")

    // batch 1 crosses T -> one-time consolidation under the wide family:
    // pair A (wide can't see it) must be RECLAIMED, pair B survives
    step(1L, Seq("k5" -> h5, "k6" -> h6))
    val wideEra = decisions(MediaStream.imageDedupView(spark, state))
    assert(wideEra("k2") == ((0L, true)),
      s"narrow-only pair must vanish after the regime rewrite: $wideEra")
    assert(wideEra("k4") == ((1L, false)), "guaranteed pair survives")

    // stream == batch at the final size (the contract the rewrite buys)
    val allHashes = Seq("k1" -> h1, "k2" -> h2, "k3" -> h3, "k4" -> h4,
      "k5" -> h5, "k6" -> h6).toDF("img_key", "h")
    val batchTwin = decisions(Multimodal.dedupDecisions(allHashes,
      Multimodal.confirmedPairs(allHashes, allHashes, maxHamming = 10,
        wideThreshold = T)))
    assert(wideEra == batchTwin, s"stream/batch drift: $wideEra vs $batchTwin")

    // replaying a PRE-crossing batch re-detects the boundary and
    // re-consolidates over the current store — the view is unchanged
    step(0L, Seq("k1" -> h1, "k2" -> h2, "k3" -> h3, "k4" -> h4))
    assert(decisions(MediaStream.imageDedupView(spark, state)) == wideEra,
      "replay after the crossing must be a no-op on the view")
  }
}
