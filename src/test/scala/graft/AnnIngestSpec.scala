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
    // retrains, it assigns against the persisted model
    val (cents, _) = Similarity.ivfIndex(emb.where(s"vec_id < $c1"))
    cents.write.mode("overwrite").parquet(s"$state/cents")
    val model = Similarity.centroidModel(spark.read.parquet(s"$state/cents"))

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
