package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Similarity

/** Streaming embedding ingest with INCREMENTAL ANN indexing — the
  * always-on form of q161: vectors arrive in micro-batches, each batch
  * is assigned against the current persisted centroid model (one
  * narrow map, zero shuffles — the centroids ride as literals exactly
  * like the batch path), and the assignment store grows by batch-keyed
  * parquet appends. The maintained index always equals what batch
  * assignment of everything-seen-so-far would produce, because IVF
  * assignment is per-vector independent given centroids — the same
  * structural argument that makes q161 exact, carried across batch
  * boundaries and restarts.
  *
  * State layout (the CurationStream conventions), GENERATION-keyed so
  * a retrain is a new model generation instead of an in-place
  * overwrite:
  *  - `statePath/cents/gen=<g>` — centroid model generations. gen=0
  *    is written by the offline trainer (q161's `ivfIndex` on the
  *    base corpus); [[retrain]] adds gen+1. Readers use the LATEST
  *    generation; superseded ones stay on disk until
  *    [[vacuumGenerations]] reclaims them (the store lifecycle,
  *    applied to the streaming state).
  *  - `statePath/vec/batch=<id>` — each batch's raw vectors, the
  *    stream-of-record a retrain reads (at scale the stream IS the
  *    source; nothing else holds the ingested vectors).
  *  - `statePath/asg/gen=<g>/batch=<id>` — per-(generation, batch)
  *    assignments, OVERWRITE: an at-least-once replay of a batch
  *    rewrites its own directory, so the fold is replay-idempotent by
  *    layout; [[assignments]] reads only the live generation and
  *    dedups by vec_id, so a batch replayed AFTER a retrain (its
  *    vectors already covered by the retrain's consolidated
  *    reassignment, with identical cids by per-vector independence)
  *    changes nothing.
  *
  * [[clusterCounts]] is the index-health view the retrain decision
  * reads: when the biggest cluster's share breaches the q163 fair-
  * share gate (the registered q166 runs that gate over THIS streamed
  * state), the ingest [[step]] itself triggers [[retrain]] +
  * [[vacuumGenerations]] — the loop closes AT RUNTIME, per batch,
  * with no operator in it (AnnIngestSpec drives the skewed stream
  * through the automatic path). */
object AnnIngest {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Live (= max) model generation under `statePath/cents`. */
  private[graft] def liveGen(spark: SparkSession, statePath: String): Long = {
    val root = new Path(s"$statePath/cents")
    val f = fs(spark, s"$statePath/cents")
    if (!f.exists(root)) throw new IllegalStateException(
      s"AnnIngest: no centroid model under $statePath/cents — train gen=0 first")
    f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=").toLong).max
  }

  private def centsOf(spark: SparkSession, statePath: String, gen: Long) =
    Similarity.centroidModel(
      spark.read.parquet(s"$statePath/cents/gen=$gen").select("cid", "c"))

  /** One micro-batch: land the raw vectors (the retrain source), then
    * assign against the LIVE model generation into that generation's
    * assignment store. Own dirs first, both overwrites — a replay
    * heals its previous partial write before anything reads the roots.
    *
    * With `autoRetrain` (the default) the step then CLOSES the retrain
    * loop at runtime: it evaluates the q163 fair-share gate over the
    * live assignment store (max cluster ≤ 8× of 1/k — a #clusters-row
    * aggregate over a two-column pruned scan of the asg store) and, on
    * breach, triggers [[retrain]] + [[vacuumGenerations]] in-line —
    * the skew→retrain→vacuum cycle the q166 gate monitors, no operator
    * in the loop. A retrain mid-stream is safe by the generation
    * layout: the NEXT batch reads the new live generation; a batch
    * replayed across the boundary is a no-op on [[assignments]]
    * (identical cids by per-vector independence). A balanced stream
    * never breaches, so the steady-state cost is the gate aggregate. */
  private[graft] def step(batch: DataFrame, batchId: Long,
      statePath: String, autoRetrain: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val vecs = batch.select("vec_id", "embedding")
    vecs.write.mode("overwrite").parquet(s"$statePath/vec/batch=$batchId")
    val gen = liveGen(spark, statePath)
    Similarity.assignAgainst(vecs, centsOf(spark, statePath, gen))
      .write.mode("overwrite").parquet(s"$statePath/asg/gen=$gen/batch=$batchId")
    if (autoRetrain && !balanceOk(spark, statePath, gen)) {
      retrain(spark, statePath)
      vacuumGenerations(spark, statePath)
    }
  }

  /** The q163 fair-share gate over the live assignment store: largest
    * cluster ≤ 8× its 1/k share, k = the live generation's centroid
    * count. One k-row aggregate; TRUE on an empty store. */
  private[graft] def balanceOk(spark: SparkSession, statePath: String,
      gen: Long): Boolean = {
    val k = spark.read.parquet(s"$statePath/cents/gen=$gen").count()
    val row = assignments(spark, statePath)
      .groupBy("cid").agg(count(lit(1)).as("n"))
      .agg(max("n").as("mx"), sum("n").as("tot")).head()
    row.isNullAt(0) || row.getLong(0) * k <= row.getLong(1) * 8L
  }

  /** Start the ingest loop over a streaming (vec_id, embedding) frame.
    * `statePath/cents/gen=0` must already hold the trained model. */
  def start(vecs: DataFrame, statePath: String,
            checkpointPath: String,
            autoRetrain: Boolean = true): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(batch, batchId, statePath, autoRetrain)
      }

  /** Every live-generation assignment — row-identical to batch
    * assignment of the same vectors against the live centroids
    * (AnnIngestSpec pins it across a restart, a replay, and a
    * replay-after-retrain). The vec_id dedup makes retrain-overlapped
    * replays no-ops: duplicates carry identical cids by per-vector
    * independence, so MIN is a representative, not a choice. */
  def assignments(spark: SparkSession, statePath: String): DataFrame = {
    val p = new Path(s"$statePath/asg")
    if (!fs(spark, statePath).exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL("vec_id BIGINT, cid BIGINT"))
    else {
      val gen = liveGen(spark, statePath)
      // project away the partition-discovered `batch` column so the
      // empty and non-empty branches share the documented two-column
      // schema; dedup by vec_id for replay-after-retrain
      spark.read.parquet(s"$statePath/asg/gen=$gen")
        .groupBy("vec_id").agg(min("cid").as("cid"))
    }
  }

  /** Per-cluster vector counts — the balance metric the retrain
    * decision reads (a cluster absorbing the stream means the model no
    * longer spreads the data; probe cost degrades toward brute force).
    * q166 runs the q163 fair-share gate over exactly this view. */
  def clusterCounts(spark: SparkSession, statePath: String): DataFrame =
    assignments(spark, statePath)
      .groupBy("cid").agg(count(lit(1)).as("n_vecs"))
      .orderBy("cid")

  /** RETRAIN: train a NEW centroid generation on everything ingested
    * (the vec store — the base corpus is never needed again), then
    * reassign the live index against it in one narrow map, written as
    * the new generation's consolidated batch. k re-derives from the
    * ingested count ([[graft.functions.Portable.ivfK]]), so a stream
    * that outgrew its model also gets the WIDTH the corpus now
    * warrants. Old generations stay readable until
    * [[vacuumGenerations]]. Returns the new generation id. */
  def retrain(spark: SparkSession, statePath: String): Long = {
    val all = spark.read.parquet(s"$statePath/vec")
      .select("vec_id", "embedding")
    val n = all.count()
    val k = graft.functions.Portable.ivfK(n)
    val (cents, _) = Similarity.ivfIndex(all, k = k,
      trainMod = graft.functions.Portable.ivfTrainMod(n, k))
    val gen = liveGen(spark, statePath) + 1
    cents.write.mode("overwrite").parquet(s"$statePath/cents/gen=$gen")
    Similarity.assignAgainst(all, centsOf(spark, statePath, gen))
      .write.mode("overwrite").parquet(s"$statePath/asg/gen=$gen/batch=0")
    gen
  }

  /** Reclaim superseded model generations (centroids + their
    * assignment stores), keeping the newest `keepLast`. The streaming
    * state's vacuum — the same lifecycle contract the persisted batch
    * index gets from GraftStore.vacuum. Returns deleted generation ids. */
  def vacuumGenerations(spark: SparkSession, statePath: String,
      keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1)
    val f = fs(spark, statePath)
    val gens = f.listStatus(new Path(s"$statePath/cents")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong).sorted
    val drop = gens.dropRight(keepLast)
    drop.foreach { g =>
      f.delete(new Path(s"$statePath/cents/gen=$g"), true)
      f.delete(new Path(s"$statePath/asg/gen=$g"), true)
    }
    drop
  }

  // ------------------------------------------- streamed semantic dedup

  /** q159 as a streaming fold — the third CurationStream-style fold
    * next to fp-exact and passage dedup: per batch, assign the new
    * vectors against the PINNED gen=0 model (SemDeDup clusters with a
    * fixed quantizer, exactly as batch q159 pins the q36 index), then
    * compare NEW × everything-seen cluster-locally — never seen×seen,
    * the q115/q161 incremental shape. The drop set is an append-only
    * ∪-semilattice: keep(v) = "no smaller-id cluster-mate at cosine ≥
    * τ" is monotone (a killer, once arrived, kills forever), so each
    * batch contributes the larger-id side of every τ-pair it
    * completes — INCLUDING the retro-displacement where a late small-
    * id arrival kills an already-kept vector. Replay is idempotent by
    * batch-keyed overwrite; a replay folding against later arrivals
    * can only record pairs those arrivals' own steps already recorded. */
  private[graft] def semStep(batch: DataFrame, batchId: Long,
      statePath: String, tauE6: Long = 300000L): Unit = {
    val spark = batch.sparkSession
    val vecs = batch.select("vec_id", "embedding")
    val asg = Similarity.assignAgainst(vecs, centsOf(spark, statePath, 0L))
    // own dir FIRST: the batch's vectors+cids join the store before the
    // cluster-local compare reads it, so new×new pairs are covered too
    vecs.join(asg, "vec_id")
      .write.mode("overwrite").parquet(s"$statePath/semvec/batch=$batchId")
    val all = spark.read.parquet(s"$statePath/semvec")
      .select("vec_id", "embedding", "cid")
    Similarity.semanticDropsAgainst(vecs.join(asg, "vec_id"), all, tauE6)
      .write.mode("overwrite").parquet(s"$statePath/semdrop/batch=$batchId")
  }

  /** Start the semantic-dedup fold over a streaming (vec_id, embedding)
    * frame. `statePath/cents/gen=0` must already hold the model. */
  def startSemanticDedup(vecs: DataFrame, statePath: String,
      checkpointPath: String, tauE6: Long = 300000L): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        semStep(batch, batchId, statePath, tauE6)
      }

  /** (vec_id, cid, keep) over everything streamed so far —
    * row-identical to batch [[Similarity.semanticDedup]] on the same
    * vectors against the same gen=0 model (AnnIngestSpec pins it
    * across a restart and a planted retro-displacement). */
  def semanticDedupView(spark: SparkSession, statePath: String): DataFrame = {
    val vecs = spark.read.parquet(s"$statePath/semvec").select("vec_id", "cid")
    val drops = spark.read.parquet(s"$statePath/semdrop")
      .select("vec_id").distinct().withColumn("dup", lit(true))
    vecs.join(drops, Seq("vec_id"), "left")
      .selectExpr("vec_id", "cid", "dup IS NULL AS keep")
      .orderBy("vec_id")
  }
}
