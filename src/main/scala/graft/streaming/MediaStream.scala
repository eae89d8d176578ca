package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.functions.Multimodal

/** Streaming PERCEPTUAL image dedup — the always-on form of q171, under
  * the CurationStream state discipline: images arrive in micro-batches,
  * each batch is aHashed where it lands (a narrow map — the BYTES never
  * leave their executor or enter the state; only the 8-byte hash and
  * key persist), and confirmed near-dup pairs are maintained
  * incrementally: per batch the NEW hashes compare against the seen-so-
  * far hash store (new × (seen ∪ new), never seen × seen — the
  * q115/q161/semStep incremental shape; own batch is written first so
  * new×new pairs are covered).
  *
  * Keep-first by key is "no smaller-keyed confirmed mate" — maintained
  * as an append-only pair set (a ∪-semilattice, like the passage-dedup
  * min table): a later batch carrying a smaller-keyed near-dup of an
  * already-kept image displaces it at READ time (the retro-displacement
  * the spec plants), no state rewrite. Replay-idempotent by batch-keyed
  * overwrite; [[imageDedupView]] is row-identical to batch
  * [[Multimodal.imageDedup]] over everything streamed (MediaStreamSpec
  * pins it across a restart).
  *
  * State layout:
  *  - `statePath/imghash/batch=<id>` — (img_key, h) per batch
  *  - `statePath/imgpair/batch=<id>` — confirmed (key_a < key_b) pairs
  *    involving that batch's images
  */
object MediaStream {

  private[graft] def hashStep(batch: DataFrame, batchId: Long,
      statePath: String, maxHamming: Int = 10,
      wideThreshold: Long = 1L << 18): Unit =
    hashStepHashed(
      Multimodal.hashImages(batch.select("img_key", "data")).localCheckpoint(),
      batchId, statePath, maxHamming, wideThreshold)

  /** The fold body after hashing — split out so the regime-boundary
    * spec can drive it with planted hash bit patterns (pixels can't
    * target specific aHash bits).
    *
    * Banding-regime consistency: [[Multimodal.bandCombos]] picks the
    * band family from CORPUS SIZE, and past the guaranteed radius
    * (Hamming 4..maxHamming) the two families confirm DIFFERENT
    * probabilistic tails — so a stream that picked per-batch regimes
    * would freeze early pairs under the narrow family while batch
    * [[Multimodal.imageDedup]] over the same images uses the wide one,
    * silently breaking the stream ≡ batch contract once the store
    * crosses the threshold. Instead the step detects the ONE crossing
    * (store size before ≤ T < after — monotone growth crosses once)
    * and RE-CONFIRMS the whole store under the new family into a
    * reserved `imgpair/batch=consolidated` dir, deleting the
    * narrow-era per-batch dirs (the AnnIngest retrain/vacuum pattern:
    * a one-time O(store) re-band, amortized constant). Replays are
    * self-healing rather than skipped: a replayed pre-crossing batch
    * re-detects nBefore ≤ T and re-consolidates over the CURRENT
    * store — complete by construction, because all×all under the wide
    * family covers every pair any incremental dir recorded, so
    * deleting those dirs afterward loses nothing. */
  private[graft] def hashStepHashed(hashed: DataFrame, batchId: Long,
      statePath: String, maxHamming: Int = 10,
      wideThreshold: Long = 1L << 18): Unit = {
    val spark = hashed.sparkSession
    // own dir FIRST: the batch's hashes join the store before the
    // banded compare reads it, so new×new pairs are covered too
    hashed.write.mode("overwrite").parquet(s"$statePath/imghash/batch=$batchId")
    val all = spark.read.parquet(s"$statePath/imghash").select("img_key", "h")
    val nAfter = all.count()
    val nBefore = nAfter - hashed.count()
    if (nBefore <= wideThreshold && wideThreshold < nAfter) {
      // the regime boundary: consolidate EVERYTHING under the wide
      // family, then reclaim the narrow-era pair dirs
      Multimodal.confirmedPairs(all, all, maxHamming, Some(nAfter), wideThreshold)
        .write.mode("overwrite")
        .parquet(s"$statePath/imgpair/batch=consolidated")
      val root = new org.apache.hadoop.fs.Path(s"$statePath/imgpair")
      val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(root).filter(_.getPath.getName != "batch=consolidated")
        .foreach(st => f.delete(st.getPath, true))
    } else {
      Multimodal.confirmedPairs(hashed, all, maxHamming, Some(nAfter), wideThreshold)
        .write.mode("overwrite").parquet(s"$statePath/imgpair/batch=$batchId")
    }
  }

  /** Start the image-dedup fold over a streaming (img_key, data) frame. */
  def startImageDedup(images: DataFrame, statePath: String,
      checkpointPath: String, maxHamming: Int = 10,
      wideThreshold: Long = 1L << 18): DataStreamWriter[Row] =
    images.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        hashStep(batch, batchId, statePath, maxHamming, wideThreshold)
      }

  /** (img_key, n_mates, keep) over everything streamed so far —
    * row-identical to batch [[Multimodal.imageDedup]] on the same
    * images. Pairs dedup across batches at read time (a pair whose
    * endpoints arrived in different batches is recorded once, but
    * replay or same-batch symmetry can double it — distinct() is the
    * semilattice join). */
  def imageDedupView(spark: SparkSession, statePath: String): DataFrame =
    Multimodal.dedupDecisions(
      spark.read.parquet(s"$statePath/imghash").select("img_key", "h"),
      spark.read.parquet(s"$statePath/imgpair")
        .select("key_a", "key_b").distinct())
}
