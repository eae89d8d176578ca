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
}
