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
  *    state: the watermark-state-size problem never arises and a
  *    restart resumes from the checkpoint with the index intact.
  *
  * Drop rule (the q116 verdict): a new document is dropped iff it
  * near-matches the existing index (the index always wins a cross
  * pair) or a smaller-id document of its own batch.
  */
object CorpusIngest {

  /** Per-new-doc KEEP verdict from an [[Dedup.incrementalNearDups]]
    * pair set: the batch ids that lose a pair. Cross pairs drop the
    * batch side (identified by semi-join against the batch ids — index
    * ids never occur in the batch); within-batch pairs drop the larger
    * id (deterministic keep-first). */
  def dropIds(batchIds: DataFrame, pairs: DataFrame): DataFrame = {
    val crossDrops = pairs.where("is_cross")
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(batchIds, Seq("doc_id"), "left_semi")
    val withinDrops = pairs.where("NOT is_cross").select(col("doc_b").as("doc_id"))
    crossDrops.unionByName(withinDrops).distinct()
  }

  /** Start the ingest loop over a streaming `documents`-shaped frame
    * (doc_id, text, ...). Kept rows append to `corpusPath`; their
    * (band, bv) rows and shingle sets append to `indexPath`/bands and
    * `indexPath`/sh. `AvailableNow` drains what exists and stops —
    * callers wanting a long-lived service swap the trigger. */
  def start(docs: DataFrame, indexPath: String, corpusPath: String,
            checkpointPath: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fs = new Path(indexPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // sign the batch ONCE; localCheckpoint releases the file-stream
        // lineage so the frame is freely reusable across the writes
        val sigs = Dedup.signatures(batch).localCheckpoint()
        // bootstrap: an absent index becomes an EMPTY one (same schema,
        // taken from the batch's own frames) — every batch then runs
        // the identical incremental plan, no first-batch special case
        if (!fs.exists(new Path(s"$indexPath/bands"))) {
          Dedup.bandedOf(sigs).limit(0).write.parquet(s"$indexPath/bands")
          sigs.select("doc_id", "sh").limit(0).write.parquet(s"$indexPath/sh")
        }
        val pairs = Dedup.incrementalNearDupsFrom(
          spark.read.parquet(s"$indexPath/bands"),
          spark.read.parquet(s"$indexPath/sh"), sigs)
        val drops = dropIds(batch.select("doc_id"), pairs).localCheckpoint()
        val keptIds = batch.select("doc_id")
          .join(drops, Seq("doc_id"), "left_anti")
        batch.join(drops, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(corpusPath)
        Dedup.bandedOf(sigs).join(keptIds, Seq("doc_id"), "left_semi")
          .write.mode("append").parquet(s"$indexPath/bands")
        sigs.select("doc_id", "sh").join(keptIds, Seq("doc_id"), "left_semi")
          .write.mode("append").parquet(s"$indexPath/sh")
        ()
      }
}
