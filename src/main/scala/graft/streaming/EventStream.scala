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

  /** Sessionization as custom state (`flatMapGroupsWithState`) — the
    * KeyValueGroupedDataset surface for state Spark's built-ins can't
    * express. Input rows are (user_id, unix_micros, event_id); output
    * matches q35's (user_id, sess ordinal, n_events). In batch mode each
    * group sees all its events at once (the spec cross-checks it against
    * the q35 window formulation); in streaming the same function runs
    * incrementally with the state carried between micro-batches. */
  def sessionizeStateful(events: Dataset[(Long, Long, Long)],
                         gapUs: Long = 1800000000L): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Long, UserSession](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long)], state: GroupState[Long]) =>
          val baseSess = state.getOption.getOrElse(0L)
          val sorted = it.toIndexedSeq.sortBy(e => (e._2, e._3))
          val sessions = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var sess = baseSess
          var n = 0L
          var prevUs = Long.MinValue
          sorted.foreach { case (_, us, _) =>
            if (prevUs == Long.MinValue || us - prevUs > gapUs) {
              if (n > 0) sessions += UserSession(user, sess, n)
              sess += 1; n = 0
            }
            n += 1
            prevUs = us
          }
          if (n > 0) sessions += UserSession(user, sess, n)
          state.update(sess)
          sessions.iterator
      }
  }

  /** T1: incremental append sink. Each micro-batch is anti-joined against
    * the keys already present in `targetPath`, so re-delivered rows are
    * ignored — the reference's re-run-safety filter, generalized. The
    * checkpoint makes restarts resume, not reprocess. */
  def incrementalAppend(stream: DataFrame, keyCol: String,
                        targetPath: String, checkpointPath: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existingKeys =
          try spark.read.parquet(targetPath).select(keyCol)
          catch { case _: Exception => spark.emptyDataFrame.withColumn(keyCol, lit(null).cast("long")) }
        batch.join(existingKeys, Seq(keyCol), "left_anti")
          .write.mode("append").parquet(targetPath)
      }
}
