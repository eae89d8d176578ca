package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, CurationPipeline, Packing, Relational}
import graft.streaming.CurationStream

/** End-to-end gate for the STREAMED curation pipeline: the maintained
  * pool and manifest must be row-identical to the batch q129/q124
  * result on the same input — across arbitrary micro-batch splits, a
  * mid-stream restart, and an at-least-once replay of the last batch.
  * The input plants every cross-batch hazard: a duplicate whose
  * SMALLER-id twin arrives two batches later (displacement), a
  * contaminated doc probing the eval set a batch after the eval doc
  * streamed past, a quality reject, and a per-source cap overflow whose
  * later arrivals outrank (and must evict) pooled docs. */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def words(id: Long, n: Int = 8): String =
    (1 to n).map(i => s"d${id}w$i").mkString(" ")

  // (doc_id, text, source, n_chars) — ids < 97 so doc_id%97==3 only for
  // the deliberate eval doc 3
  private val evalText = "ev1 ev2 ev3 ev4 ev5 ev6 ev7 ev8"
  private val dupText = words(999) // shared by ids 60 / 20 / 70
  private def s1Docs(ids: Seq[Long]) =
    ids.map(i => (i, words(i), "s1", 100L + i))

  private val b1 = s1Docs(Seq(30L, 31L, 32L, 33L, 34L, 35L)) ++ Seq(
    (3L, evalText, "s2", 120L),       // eval doc (3 % 97 == 3)
    (60L, dupText, "s2", 140L))       // first twin of the dup trio
  private val b2 = s1Docs(Seq(36L, 37L, 38L, 39L, 40L)) ++ Seq(
    (10L, s"d10a ev1 ev2 ev3 ev4 ev5 ev6 d10b", "s2", 130L), // contaminated
    (11L, "too short", "s2", 9L))     // quality reject (2 tokens)
  private val b3 = s1Docs(Seq(41L, 42L, 43L, 44L)) ++ Seq(
    (20L, dupText, "s2", 140L))       // SMALLER-id twin → displaces 60
  private val b4 = s1Docs(Seq(45L, 46L)) ++ Seq(
    (70L, dupText, "s2", 140L),       // larger-id twin → dropped
    (80L, words(80), "s2", 150L), (81L, words(81), "s2", 151L))

  private def df(rows: Seq[(Long, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "source", "n_chars")

  private val all = b1 ++ b2 ++ b3 ++ b4

  // the static benchmark shingles, EXACTLY as the batch pipeline carves
  // them: post-dedup, quality-passing eval docs
  private def evalShingles: DataFrame = {
    import org.apache.spark.sql.functions._
    val deduped = Relational.keepFirst(
      df(all).withColumn("fp", md5(col("text"))),
      Seq("fp"), Seq(col("doc_id"))).drop("fp")
    Curation.evalShingleSet(
      CurationPipeline.qualityGate(deduped).where("doc_id % 97 = 3")
        .select("doc_id", "text"))
  }

  private def rows(d: DataFrame): Seq[(Long, String, String, Long)] =
    d.select("doc_id", "text", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted

  private def manifestRows(d: DataFrame): Seq[(Long, Long, Long, Long, Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted

  test("streamed pool + manifest equal the batch pipeline across batches, restart, and replay") {
    val stage = Files.createTempDirectory("cur_src").toString
    val state = Files.createTempDirectory("cur_state").toString + "/state"
    val ckpt = Files.createTempDirectory("cur_ckpt").toString
    val evalSh = evalShingles.localCheckpoint()

    def addFile(name: String, rows: Seq[(Long, String, String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("cur_tmp").toString
      df(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(stage, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, source STRING, n_chars LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
      val q = CurationStream.start(stream, evalSh, state, ckpt).start()
      q.processAllAvailable(); q.stop()
    }

    // phase 1: two micro-batches, then the query STOPS (the crash point)
    addFile("b1.parquet", b1); addFile("b2.parquet", b2)
    run()
    // phase 2: two more files, fresh query off the SAME checkpoint
    addFile("b3.parquet", b3); addFile("b4.parquet", b4)
    run()

    val expectedSurvivors = CurationPipeline.survivors(df(all))
    val expectedManifest = Packing.shardManifest(expectedSurvivors)
    assert(rows(CurationStream.latestPool(spark, state)) == rows(expectedSurvivors),
      "streamed pool diverged from batch survivors")
    assert(manifestRows(CurationStream.latestManifest(spark, state)) ==
      manifestRows(expectedManifest),
      "streamed manifest diverged from the batch q124 manifest")

    // the planted hazards actually happened: 60 was displaced by 20,
    // 70/10/11 never admitted, s1 holds exactly the cap
    val poolIds = CurationStream.latestPool(spark, state)
      .select("doc_id").as[Long].collect().toSet
    assert(poolIds.contains(20L) && !poolIds.contains(60L) && !poolIds.contains(70L))
    assert(!poolIds.contains(10L) && !poolIds.contains(11L) && !poolIds.contains(3L))
    assert(CurationStream.latestPool(spark, state)
      .where("source = 's1'").count() == 15L)

    // at-least-once replay: re-running the LAST batch is a no-op
    val before = (rows(CurationStream.latestPool(spark, state)),
      manifestRows(CurationStream.latestManifest(spark, state)))
    CurationStream.step(df(b4), 3L, evalSh, state)
    val after = (rows(CurationStream.latestPool(spark, state)),
      manifestRows(CurationStream.latestManifest(spark, state)))
    assert(after == before, "replaying the last batch changed the state")
  }

  test("streamed kernel tokenize + packing equal the batch tail across batches and replay") {
    import graft.operators.{Bpe, Packing}
    val stage = Files.createTempDirectory("tok_src").toString
    val state = Files.createTempDirectory("tok_state").toString + "/state"
    val ckpt = Files.createTempDirectory("tok_ckpt").toString
    val evalSh = evalShingles.localCheckpoint()
    // a real (if tiny) shipped artifact: one merge — enough to make the
    // kernel path produce counts no whitespace count equals
    val model = new graft.plans.BpeEncodeModel(Array("a"), Array("a"))

    def addFile(name: String, rows: Seq[(Long, String, String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("tok_tmp").toString
      df(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(stage, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    Seq("b1" -> b1, "b2" -> b2, "b3" -> b3, "b4" -> b4).foreach {
      case (n, b) => addFile(s"$n.parquet", b)
    }
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = CurationStream.start(stream, evalSh, state, ckpt,
      model = Some(model)).start()
    q.processAllAvailable(); q.stop()

    // the batch twin: survivors() -> kernel counts -> q157 packing tail
    def rollup(d: DataFrame): Seq[(Long, Long, Long, Long)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    val surv = CurationPipeline.survivors(df(all))
    val want = Packing.packSequencesBy(
        Bpe.encodeCounts(surv.select("doc_id", "text"), model, "n_bpe_tokens")
          .selectExpr("doc_id", "n_bpe_tokens AS n_toks"))
      .groupBy("shard")
      .agg(org.apache.spark.sql.functions.countDistinct("doc_id").as("n_docs"),
        org.apache.spark.sql.functions.sum("seg_tokens").cast("long").as("n_tokens"),
        org.apache.spark.sql.functions.countDistinct("seq_id").as("n_seqs"))
    assert(rollup(CurationStream.bpePackingView(spark, state)) == rollup(want),
      "streamed packing view diverged from the batch tail")

    // replaying the last batch is a no-op for the tokenize state too
    val before = rollup(CurationStream.bpePackingView(spark, state))
    CurationStream.step(df(b4), 3L, evalSh, state, Some(model))
    assert(rollup(CurationStream.bpePackingView(spark, state)) == before,
      "replaying the last batch changed the tokenize state")

    // the streamed tokenize plan is JOINLESS: the model rides inside
    // the TokenizeCounts expression (the q188 claim, asserted on the
    // exact code path step() writes btoks with)
    val plan = Bpe.encodeCounts(
      spark.read.parquet(s"$stage/b1.parquet").select("doc_id", "text"),
      model, "n_bpe_tokens").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"streamed tokenize plan has a join:\n$plan")
    assert(plan.toLowerCase.contains("tokenizecounts"),
      "kernel expression missing from the streamed tokenize plan")
  }

  test("streamed passage dedup equals batch q139 across batches, a restart, and replay") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val stage = Files.createTempDirectory("psg_src").toString
    val state = Files.createTempDirectory("psg_state").toString + "/state"
    val ckpt = Files.createTempDirectory("psg_ckpt").toString

    // sub-document hazards across batch boundaries: doc 50 (batch 1)
    // and doc 5 (batch 3) share an 8-token passage — the SMALLER-id doc
    // arrives LATER, so the view must retro-purge 50's copy; doc 90
    // repeats 50's passage too (larger id, dropped); doc 7 is unique
    val shared = (1 to 8).map(i => s"sh$i").mkString(" ")
    val p1 = Seq(
      (50L, shared + " " + words(50), "s1", 100L),
      (7L, words(7, n = 12), "s1", 100L))
    val p2 = Seq(
      (90L, words(90) + " " + shared, "s1", 100L),
      (8L, words(8, n = 20), "s1", 100L))
    val p3 = Seq(
      (5L, words(5) + " " + shared, "s1", 100L),
      (9L, words(9, n = 5), "s1", 100L))
    val allP = p1 ++ p2 ++ p3

    def addFile(name: String, rows: Seq[(Long, String, String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("psg_tmp").toString
      df(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(stage, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, source STRING, n_chars LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
      val q = CurationStream.startPassageDedup(stream, state, ckpt).start()
      q.processAllAvailable(); q.stop()
    }

    addFile("p1.parquet", p1); addFile("p2.parquet", p2)
    run() // crash point
    addFile("p3.parquet", p3)
    run() // fresh query, same checkpoint

    def viewRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    val want = viewRows(Dedup.passageDedup(df(allP).select("doc_id", "text")))
    val got = viewRows(CurationStream.passageDedupView(spark, state))
    assert(got == want, "streamed passage dedup diverged from batch q139")

    // the cross-batch retro-purge happened: doc 5 owns the shared
    // passage, doc 50 keeps only its tail, doc 90 lost it too
    val byDoc = got.map(t => t._1 -> t._3).toMap
    assert(byDoc(5L).contains("sh1"), "late smaller-id doc must win the passage")
    assert(!byDoc(50L).contains("sh1") && !byDoc(90L).contains("sh1"),
      "earlier larger-id copies must be retro-purged")

    // at-least-once replay of the last batch is a no-op
    CurationStream.passageStep(df(p3), 2L, state)
    assert(viewRows(CurationStream.passageDedupView(spark, state)) == want,
      "replaying the last batch changed the view")
  }
}
