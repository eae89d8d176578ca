package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.AnnIngest

/** Streaming ANN ingest gate: the maintained assignment store must be
  * row-identical to batch assignment of every vector seen so far
  * against the same persisted centroid model — across micro-batch
  * splits, a mid-stream restart, and an at-least-once replay. */
class AnnIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed assignments equal batch assignment across restart and replay") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = emb.count()
    val (c1, c2) = (n / 3, 2 * n / 3)

    val stage = Files.createTempDirectory("ann_src").toString
    val state = Files.createTempDirectory("ann_state").toString + "/state"
    val ckpt = Files.createTempDirectory("ann_ckpt").toString

    // offline training on the FIRST slice only — the stream never
    // retrains, it assigns against the persisted model (generation 0)
    val (cents, _) = Similarity.ivfIndex(emb.where(s"vec_id < $c1"))
    cents.write.mode("overwrite").parquet(s"$state/cents/gen=0")
    val model = Similarity.centroidModel(
      spark.read.parquet(s"$state/cents/gen=0"))

    def addFile(name: String, rows: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("ann_tmp").toString
      rows.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(stage, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
      val q = AnnIngest.start(stream, state, ckpt).start()
      q.processAllAvailable(); q.stop()
    }

    addFile("b1.parquet", emb.where(s"vec_id < $c1"))
    addFile("b2.parquet", emb.where(s"vec_id >= $c1 AND vec_id < $c2"))
    run() // crash point
    addFile("b3.parquet", emb.where(s"vec_id >= $c2"))
    run() // fresh query, same checkpoint

    def rows(d: DataFrame) = d.select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = rows(Similarity.assignAgainst(emb, model))
    val got = rows(AnnIngest.assignments(spark, state))
    assert(got == want, "streamed index diverged from batch assignment")
    assert(got.map(_._1).distinct.size == n, "every vector exactly once")

    // at-least-once replay of the last batch is a no-op
    AnnIngest.step(emb.where(s"vec_id >= $c2"), 2L, state)
    assert(rows(AnnIngest.assignments(spark, state)) == want)

    // the balance view matches a direct rollup of the same assignments
    val counts = AnnIngest.clusterCounts(spark, state).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantCounts = want.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(counts == wantCounts)
  }

  private def addFileTo(stage: String)(name: String, rows: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("ann_tmp").toString
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, Paths.get(stage, name),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("streamed semantic dedup equals batch, incl. retro-displacement, across restart") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = emb.count()
    // corpus = the real vectors + a PLANTED exact copy of vec 3 at a
    // LARGER id: its killer (vec 3) arrives in a LATER batch, so the
    // copy must be kept mid-stream and retro-displaced afterwards
    val planted = emb.where("vec_id = 3").selectExpr(
      s"$n AS vec_id", "embedding")
    val all = emb.unionByName(planted)

    val stage = Files.createTempDirectory("sem_src").toString
    val state = Files.createTempDirectory("sem_state").toString + "/state"
    val ckpt = Files.createTempDirectory("sem_ckpt").toString
    val (cents, _) = Similarity.ivfIndex(emb)
    cents.write.mode("overwrite").parquet(s"$state/cents/gen=0")
    val model = Similarity.centroidModel(
      spark.read.parquet(s"$state/cents/gen=0"))

    def run(): Unit = {
      val stream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val q = AnnIngest.startSemanticDedup(stream, state, ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    def keepOf(id: Long): Boolean = AnnIngest
      .semanticDedupView(spark, state)
      .where(s"vec_id = $id").head().getBoolean(2)

    // phase 1: the upper half + the planted copy — no smaller-id mate
    // of the copy has arrived, so it must be KEPT
    addFileTo(stage)("b1.parquet",
      all.where(s"vec_id >= ${n / 2}"))
    run() // crash point
    assert(keepOf(n), "planted copy must be kept before its killer arrives")

    // phase 2 (fresh query, same checkpoint): the lower half arrives,
    // including vec 3 — smaller id, cosine 1 ⇒ the copy flips to dropped
    addFileTo(stage)("b2.parquet", all.where(s"vec_id < ${n / 2}"))
    run()
    assert(!keepOf(n), "late small-id arrival must retro-displace the copy")

    // the full view is row-identical to batch SemDeDup over the same
    // vectors against the same pinned model
    def rows(d: DataFrame) = d.select("vec_id", "cid", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq.sorted
    val want = rows(Similarity.semanticDedup(
      all, Similarity.assignAgainst(all, model), tauE6 = 300000L))
    val got = rows(AnnIngest.semanticDedupView(spark, state))
    assert(got == want, "streamed semantic dedup diverged from batch")

    // at-least-once replay of the first batch is a no-op
    AnnIngest.semStep(all.where(s"vec_id >= ${n / 2}"), 0L, state)
    assert(rows(AnnIngest.semanticDedupView(spark, state)) == want)
  }

  test("skewed stream breaches the balance gate; retrain restores it, vacuum reclaims") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = emb.count()
    val stage = Files.createTempDirectory("rt_src").toString
    val state = Files.createTempDirectory("rt_state").toString + "/state"
    val ckpt = Files.createTempDirectory("rt_ckpt").toString
    val (cents, _) = Similarity.ivfIndex(emb) // gen 0: k=16 on the base
    cents.write.mode("overwrite").parquet(s"$state/cents/gen=0")

    // the skewed tail: 2n DISTINCT-id vectors pulled 90 % toward vec 7
    // — under the gen-0 model they pile into vec 7's cluster (2/3 of
    // the stream in one cluster, far past the 8× fair share); a model
    // trained on the post-skew corpus must spread that mass
    val anchor = emb.where("vec_id = 7").selectExpr("embedding AS av")
    val mixes = emb.crossJoin(anchor)
      .selectExpr("vec_id",
        "zip_with(embedding, av, (x, a) -> cast(0.1 * x + 0.9 * a AS FLOAT)) AS embedding")
    val skew = mixes.selectExpr("vec_id + 10000 AS vec_id", "embedding")
      .unionByName(mixes.selectExpr("vec_id + 20000 AS vec_id", "embedding"))

    def run(): Unit = {
      val stream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val q = AnnIngest.start(stream, state, ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    addFileTo(stage)("b1.parquet", emb)
    addFileTo(stage)("b2.parquet", skew)
    run()

    def gate(k: Int): (Boolean, Long, Long) = {
      val counts = AnnIngest.clusterCounts(spark, state).collect()
        .map(r => r.getLong(1))
      (counts.max * k <= counts.sum * 8L, counts.max, counts.sum)
    }
    val total = n + 2 * n // base + the two shifted skew copies

    // the AUTOMATIC path: the skewed batch's own step detected the
    // fair-share breach and ran retrain + vacuum in-line — no manual
    // calls anywhere in this test
    assert(AnnIngest.liveGen(spark, state) == 1L,
      "the skewed batch must auto-retrain to generation 1")
    val k1 = graft.functions.Portable.ivfK(total)
    val (ok1, max1, sum1) = gate(k1)
    assert(sum1 == total, "reassignment must cover every ingested vector")
    assert(ok1, s"retrained model still breaches the gate (max=$max1, k=$k1)")

    // and the breached generation was vacuumed by the same step
    val f = new java.io.File(s"$state/cents/gen=0")
    assert(!f.exists, "auto-retrain must vacuum the superseded generation")

    // a batch replayed AFTER the retrain (assigned against the new
    // model) changes nothing: the consolidated reassignment already
    // covers its vectors with identical cids — and the now-balanced
    // gate keeps the replay from triggering a second retrain
    val before = AnnIngest.assignments(spark, state).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    AnnIngest.step(skew, 1L, state)
    val after = AnnIngest.assignments(spark, state).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(after == before)
    assert(AnnIngest.liveGen(spark, state) == 1L,
      "the balanced replay must not retrain again")
    assert(AnnIngest.assignments(spark, state).count() == total)
  }

  test("persisted index lifecycle: regenerate-while-reading, vacuum reclaims") {
    import graft.sources.v2.GraftStore
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = emb.count()
    def read(name: String) =
      spark.read.format("graft-store").option("name", name).load()

    // generation 1: index over the first half of the corpus
    val (centsName, asgName) = Similarity.buildPersistedIvfIndex(
      emb.where(s"vec_id < ${n / 2}"), "ivf_lifecycle_t", 16, n)
    val v1 = GraftStore.currentVersion(asgName)
    val gen1Rows = read(asgName).count()
    assert(gen1Rows == n / 2)

    // pin a reader to generation 1, then REGENERATE over the full
    // corpus: the live collection moves to generation 2 while the
    // pinned snapshot keeps serving generation 1's files
    val pinned = s"$asgName@v$v1"
    assert(read(pinned).count() == gen1Rows)
    Similarity.buildPersistedIvfIndex(emb, "ivf_lifecycle_t", 16, n)
    assert(read(asgName).count() == n, "live read must see the new generation")
    assert(read(pinned).count() == gen1Rows,
      "pinned reader lost its generation during regeneration")
    // the new generation is a usable index: every vector assigned once,
    // cids inside the centroid id space
    val cents = read(centsName).select("cid", "dim", "v").collect()
    assert(cents.map(_.getLong(0)).distinct.length == 16)
    assert(cents.length == 16 * 64) // full flat k×dim matrix
    val asg = read(asgName).select("vec_id", "cid").collect()
    assert(asg.map(_.getLong(0)).distinct.length == n)
    assert(asg.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))

    // vacuum: expired generation's files reclaimed, live rows intact,
    // the expired snapshot now fails loudly instead of half-reading
    val (expired, files, bytes) = GraftStore.vacuum(asgName, keepLast = 1)
    assert(expired >= 1 && files > 0 && bytes > 0L,
      s"vacuum reclaimed nothing: expired=$expired files=$files bytes=$bytes")
    assert(read(asgName).count() == n)
    intercept[Exception](read(pinned).count())
  }
}
