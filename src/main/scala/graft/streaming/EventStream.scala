package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming surface (SURVEY.md §2.9).
  *
  * The reference has no real streaming — its ingestion loop
  * (/root/reference/src/ingestion.py:38-92) is a bounded source consumed
  * sequentially with an early stop, and its only incremental behavior is
  * the F4 "skip already-transformed rows" filter
  * (/root/reference/src/transform_load.py:82-84). Re-expressed here as:
  *
  *  - T2: the same transform graph over a streaming DataFrame —
  *    event-time windowed aggregation with a watermark (the 100 TB-scale
  *    form of the hourly rollup in q17).
  *  - T1: incremental exactly-once-ish append via `foreachBatch` +
  *    anti-join against already-processed keys — the F4 semantics with
  *    checkpointed state instead of a mutable flag column.
  */
object EventStream {

  /** T2: event-time tumbling-window rollup over a *streaming* events
    * DataFrame (same schema as the batch `events` table). Late data
    * beyond the watermark is dropped; state is bounded. */
  def hourlyRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Session row emitted by the sessionizers. */
  case class UserSession(user_id: Long, sess: Long, n_events: Long)

  /** Sessionization via Spark's native `session_window` (gap-merged
    * event-time windows) — works identically over batch and streaming
    * DataFrames; the streaming form carries watermarked state. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Sessionizer state: ordinal of the currently-open session and the
    * micro-second timestamp of its last event. */
  case class SessState(curSess: Long, lastUs: Long)

  /** Sessionization as custom state (`flatMapGroupsWithState`) — the
    * KeyValueGroupedDataset surface for state Spark's built-ins can't
    * express. Input rows are (user_id, unix_micros, event_id).
    *
    * State carries (open-session ordinal, last event time), so a session
    * spanning micro-batches keeps ONE ordinal: each batch emits a
    * *fragment* (user_id, sess, n_events_in_this_batch) and fragments of
    * the same session share `sess` — downstream sums by (user_id, sess)
    * to get total session sizes (Append mode cannot retract the earlier
    * fragment). In batch mode each group sees all its events at once, so
    * fragments ≡ whole sessions and the output matches q35 exactly (the
    * spec cross-checks this). */
  def sessionizeStateful(events: Dataset[(Long, Long, Long)],
                         gapUs: Long = 1800000000L): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, UserSession](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long)], state: GroupState[SessState]) =>
          val st = state.getOption.getOrElse(SessState(0L, Long.MinValue))
          val sorted = it.toIndexedSeq.sortBy(e => (e._2, e._3))
          val fragments = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var sess = st.curSess
          var lastUs = st.lastUs
          var n = 0L
          sorted.foreach { case (_, us, _) =>
            if (lastUs == Long.MinValue || us - lastUs > gapUs) {
              if (n > 0) fragments += UserSession(user, sess, n)
              sess += 1; n = 0
            }
            n += 1
            lastUs = us
          }
          if (n > 0) fragments += UserSession(user, sess, n)
          state.update(SessState(sess, lastUs))
          fragments.iterator
      }
  }

  /** Streaming exact dedup: drop re-observations of a key, with state
    * bounded by the event-time watermark (a key older than the watermark
    * can be forgotten — without the watermark the state grows without
    * bound, which at 100 TB/day of events is the difference between a
    * working pipeline and an OOM). The streaming twin of q20's batch
    * keep-first dedup for continuous corpus ingestion. */
  def streamingDedup(stream: DataFrame, keyCols: Seq[String],
                     eventTimeCol: String, watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates(keyCols :+ eventTimeCol)

  /** T1: incremental append sink. Each micro-batch is anti-joined against
    * the keys already present in `targetPath`, so re-delivered rows are
    * ignored — the reference's re-run-safety filter, generalized. The
    * checkpoint makes restarts resume, not reprocess.
    *
    * Target existence is checked explicitly (Hadoop FS) — a transient
    * READ failure of an existing target must fail the batch, not be
    * mistaken for "first write" and silently duplicate rows. The empty
    * fallback takes the key's type from the batch schema. */
  def incrementalAppend(stream: DataFrame, keyCol: String,
                        targetPath: String, checkpointPath: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val path = new org.apache.hadoop.fs.Path(targetPath)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existingKeys =
          if (fs.exists(path)) spark.read.parquet(targetPath).select(keyCol)
          else batch.select(keyCol).limit(0)
        batch.join(existingKeys, Seq(keyCol), "left_anti")
          .write.mode("append").parquet(targetPath)
      }
}
