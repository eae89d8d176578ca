package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Dedup

/** Continuous corpus ingestion with ONLINE near-dup rejection — the
  * streaming form of the q115/q116 incremental dedup: documents arrive
  * in micro-batches; each batch is probed against the PERSISTED LSH
  * index, only non-duplicates are appended to the corpus, and the kept
  * documents' signatures are appended to the index so the NEXT batch
  * dedups against everything kept so far.
  *
  * Scale invariants, per batch:
  *  - the batch is SIGNED ONCE ([[Dedup.incrementalNearDupsFrom]]) and
  *    the one signature frame feeds both the probe and the index
  *    append — the corpus text already ingested is never rescanned;
  *  - per-batch cost ∝ batch size + one probe of the index files (with
  *    the index bucketed by (band, bv) at write time the probe is the
  *    pay-the-shuffle-once layout — see sources/Bucketing);
  *  - state lives in parquet (bands + shingle store), not in streaming
  *    state: the watermark-state-size problem never arises.
  *
  * Restart semantics: every write is keyed by `batch=<batchId>` and
  * OVERWRITES its own directory, so Structured Streaming's
  * at-least-once foreachBatch replay is idempotent — a crash anywhere
  * inside a batch re-runs it against the same pre-batch index view
  * (earlier batches' directories only) and rewrites the same three
  * directories. An absent index is handled IN MEMORY (empty frames
  * derived from the batch's own schema), so there is no multi-write
  * bootstrap to crash halfway through. The readers below select the
  * data columns explicitly, dropping the `batch` partition column the
  * layout introduces.
  *
  * Drop rule (the q116 verdict): a new document is dropped iff it
  * near-matches the existing index (the index always wins a cross
  * pair) or a smaller-id document of its own batch.
  */
object CorpusIngest {

  /** Per-new-doc DROP set from an [[Dedup.incrementalNearDups]] pair
    * set: the batch ids that lose a pair. Cross pairs drop the batch
    * side (identified by semi-join against the batch ids — index ids
    * never occur in the batch); within-batch pairs drop the larger id
    * (deterministic keep-first). */
  def dropIds(batchIds: DataFrame, pairs: DataFrame): DataFrame = {
    val crossDrops = pairs.where("is_cross")
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(batchIds, Seq("doc_id"), "left_semi")
    val withinDrops = pairs.where("NOT is_cross").select(col("doc_b").as("doc_id"))
    crossDrops.unionByName(withinDrops).distinct()
  }

  /** Start the ingest loop over a streaming `documents`-shaped frame
    * (doc_id, text, ...). Kept rows land under
    * `corpusPath/batch=<id>/`; their (band, bv) rows and shingle sets
    * under `indexPath`/bands and `indexPath`/sh with the same batch
    * keying. `AvailableNow` drains what exists and stops — callers
    * wanting a long-lived service swap the trigger. */
  def start(docs: DataFrame, indexPath: String, corpusPath: String,
            checkpointPath: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new Path(indexPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // sign the batch ONCE; localCheckpoint releases the file-stream
        // lineage so the frame is freely reusable across the writes
        val sigs = Dedup.signatures(batch).localCheckpoint()
        val bands = Dedup.bandedOf(sigs)
        val sh = sigs.select("doc_id", "sh")
        // an absent index = empty in-memory frames of the same shape;
        // no on-disk bootstrap writes that a crash could leave half-done.
        // The `batch <> batchId` partition filter is the other half of
        // replay safety: a replayed batch must probe the PRE-batch index
        // view — its own (possibly partial) directories from the failed
        // attempt would otherwise self-pair every document as a cross
        // dup and drop the whole batch.
        val (idxBands, idxSh) =
          if (fs.exists(new Path(s"$indexPath/bands")))
            (spark.read.parquet(s"$indexPath/bands")
               .where(col("batch") =!= batchId)
               .select("doc_id", "band", "bv"),
             spark.read.parquet(s"$indexPath/sh")
               .where(col("batch") =!= batchId)
               .select("doc_id", "sh"))
          else (bands.limit(0), sh.limit(0))
        val pairs = Dedup.incrementalNearDupsFrom(idxBands, idxSh, sigs)
        val drops = dropIds(batch.select("doc_id"), pairs).localCheckpoint()
        val kept = batch.join(drops, Seq("doc_id"), "left_anti")
        val keptIds = kept.select("doc_id")
        // batch-keyed OVERWRITE: an at-least-once replay of this batch
        // rewrites exactly these directories — idempotent by layout
        kept.write.mode("overwrite").parquet(s"$corpusPath/batch=$batchId")
        bands.join(keptIds, Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$indexPath/bands/batch=$batchId")
        sh.join(keptIds, Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$indexPath/sh/batch=$batchId")
        ()
      }
}
