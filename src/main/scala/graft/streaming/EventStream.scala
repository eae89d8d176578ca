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
  *
  * Every stateful operator here bounds its state by the watermark: at
  * 100 TB/day of events, state that only grows is the difference
  * between a pipeline and an OOM.
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

  /** Frozen reference histogram for [[psiMonitor]] — the training-time
    * value distribution as ONE row: integer-cents bounds plus per-bucket
    * counts and the total. Built batch-side (one stats pass + one
    * conditional aggregate) and handed to the monitor as static state. */
  def psiReference(events: DataFrame, nb: Int = 10): DataFrame = {
    val c = events.selectExpr("cast(round(value * 100) as bigint) AS cents")
    val bounds = c.agg(min("cents").as("lo"), max("cents").as("hi"))
    val aggs = (0 until nb).map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"ref_n$b")) :+
      count(lit(1)).as("ref_tot")
    c.crossJoin(broadcast(bounds))
      .selectExpr("lo", "hi",
        s"greatest(0L, least((cents - lo) * $nb div (hi - lo + 1), ${nb - 1}L)) AS bucket")
      .groupBy("lo", "hi")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Streaming drift monitor — the q145 PSI running ON THE STREAM: per
    * event-time hourly window, the Population Stability Index of that
    * window's value histogram against the frozen [[psiReference]]
    * (training-time distribution vs live traffic, the alerting shape a
    * serving pipeline runs). The reference rides in as a broadcast
    * stream-static join (stateless); the histogram is ONE watermark-
    * bounded windowed aggregate whose `nb` bucket counts are conditional
    * sums — no second stateful aggregation, so the plan stays inside
    * Structured Streaming's supported-operator envelope; the PSI score
    * is a stateless projection after the aggregate, per-bucket terms
    * e9-rounded before the sum (the q145 convention, add-one smoothed).
    * Stream values outside the frozen bounds clamp to the edge buckets
    * (greatest/least) — drift BEYOND the reference range lands in the
    * tails instead of vanishing. State: one row per open hour window. */
  def psiMonitor(stream: DataFrame, reference: DataFrame, nb: Int = 10,
      watermark: String = "1 hour"): DataFrame = {
    val aggs = (0 until nb).map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"n$b")) :+
      count(lit(1)).as("tot")
    val bucketed = stream.withWatermark("ts", watermark)
      .withColumn("k", lit(1))
      .join(broadcast(reference.select("lo", "hi").withColumn("k", lit(1))), "k")
      .selectExpr("ts",
        s"greatest(0L, least((cast(round(value * 100) as bigint) - lo) * $nb div (hi - lo + 1), ${nb - 1}L)) AS bucket")
    val agged = bucketed
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(aggs.head, aggs.tail: _*)
    val p = (b: Int) => s"((n$b + 1) / cast(tot + $nb as double))"
    val q = (b: Int) => s"((ref_n$b + 1) / cast(ref_tot + $nb as double))"
    val psi = (0 until nb).map(b =>
      s"cast(round(1e9 * (${p(b)} - ${q(b)}) * ln(${p(b)} / ${q(b)})) as bigint)")
      .mkString(" + ")
    agged.withColumn("k", lit(1))
      .join(broadcast(reference.drop("lo", "hi").withColumn("k", lit(1))), "k")
      .selectExpr("w.start AS hour", "tot AS n_events", s"$psi AS psi_e9")
  }

  /** T2 × X4: the q105 VARIANT path running ON THE STREAM — at 100 TB
    * telemetry blobs arrive as a stream, not a table, so the
    * parse-once/probe-many posture has to survive the watermarked
    * aggregation path. Each document is parsed ONCE into a variant
    * (`try_parse_json`: a malformed blob becomes a NULL variant whose
    * probes all yield NULL, never a query-killing parse error mid-
    * stream), the rollup keys and measures are typed `variant_get`
    * probes, and the aggregation is the same watermark-bounded hourly
    * window as [[hourlyRollup]]. StreamingSpec asserts batch/stream
    * agreement against a twin computed from the raw columns. */
  def variantHourlyRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .selectExpr("ts",
        "concat('{\"type\":\"', event_type, '\",\"cents\":', " +
          "cast(round(value * 100) as bigint), '}') AS doc")
      .selectExpr("ts", "try_parse_json(doc) AS v")
      .selectExpr("ts",
        "variant_get(v, '$.type', 'string') AS event_type",
        "variant_get(v, '$.cents', 'bigint') AS cents")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Session fragment emitted by the sessionizers. `sess` is the
    * session's START time in unix micros — a stable identifier that
    * survives state eviction (an ordinal counter would restart at 0
    * after the watermark evicts an idle user's state, colliding with
    * that user's earlier session ids). */
  case class UserSession(user_id: Long, sess: Long, n_events: Long)

  /** Sessionization via Spark's native `session_window` (gap-merged
    * event-time windows) — works identically over batch and streaming
    * DataFrames; the streaming form carries watermarked state. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Sessionizer state: start (µs) of the currently-open session and the
    * micro-second timestamp of its last event. */
  case class SessState(curStart: Long, lastUs: Long)

  /** Sessionization as custom state (`flatMapGroupsWithState`) — the
    * KeyValueGroupedDataset surface for state Spark's built-ins can't
    * express. Input rows are (user_id, unix_micros, event_id).
    *
    * State carries (open-session start, last event time), so a session
    * spanning micro-batches keeps ONE id: each batch emits a *fragment*
    * (user_id, sess, n_events_in_this_batch) and fragments of the same
    * session share `sess` — downstream sums by (user_id, sess) to get
    * total session sizes (Append mode cannot retract the earlier
    * fragment). In batch mode each group sees all its events at once, so
    * fragments ≡ whole sessions and the output matches q35 exactly (the
    * spec cross-checks this).
    *
    * State is EVICTED once the event-time watermark passes the open
    * session's gap deadline (`EventTimeTimeout`): a user idle past the
    * gap can contribute nothing more to that session, so its state row
    * is dead weight — without eviction every user_id ever seen is held
    * forever. Streaming callers must define a watermark upstream (the
    * timeout is driven by it); in batch mode timeouts never fire, which
    * is correct — a batch group is complete by construction. */
  def sessionizeStateful(events: DataFrame, gapUs: Long = 1800000000L,
                         watermark: String = "2 hours"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    // EventTimeTimeout is watermark-driven: streaming input must carry
    // one (batch input has no watermark and timeouts never fire there).
    // The watermarked ts column itself must survive the projection — the
    // analyzer requires the watermark tag on this operator's input.
    val isStreaming = events.isStreaming // plain val: the closure must not capture the DataFrame
    val wm = if (isStreaming) events.withWatermark("ts", watermark) else events
    val tuples = wm.selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "ts")
      .as[(Long, Long, Long, java.sql.Timestamp)]
    tuples.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, UserSession](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, java.sql.Timestamp)], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap deadline: the open session can
            // never be extended — drop the state row, emit nothing (its
            // fragments were already emitted eagerly).
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(SessState(Long.MinValue, Long.MinValue))
            val sorted = it.toIndexedSeq.sortBy(e => (e._2, e._3))
            val fragments = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var start = st.curStart
            var lastUs = st.lastUs
            var n = 0L
            sorted.foreach { case (_, us, _, _) =>
              if (lastUs == Long.MinValue || us - lastUs > gapUs) {
                if (n > 0) fragments += UserSession(user, start, n)
                start = us; n = 0
              }
              n += 1
              lastUs = us
            }
            if (n > 0) fragments += UserSession(user, start, n)
            state.update(SessState(start, lastUs))
            // evict once the watermark proves the session gap has passed;
            // the timeout must sit strictly above the current watermark
            // (Spark rejects a timestamp at or below it). In batch mode
            // there is no watermark (and timeouts never fire): skip.
            if (isStreaming) {
              val deadlineMs = lastUs / 1000L + gapUs / 1000L
              state.setTimeoutTimestamp(math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            }
            fragments.iterator
          }
      }
  }

  /** Streaming exact dedup: drop re-observations of a KEY — regardless
    * of the re-observation's timestamp — with state bounded by the
    * event-time watermark (`dropDuplicatesWithinWatermark`): a key older
    * than the watermark delay can be forgotten. The streaming twin of
    * q20's batch keep-first dedup for continuous corpus ingestion.
    * Within-delay redeliveries dedup exactly; a re-observation arriving
    * later than the watermark delay is treated as new — the bounded-state
    * trade every streaming dedup makes. */
  /** Stream-stream INTERVAL join: each purchase matched to the same
    * user's views in the preceding `windowMinutes` — the canonical
    * watermarked two-stream join. Both inputs carry event-time
    * watermarks and the join condition bounds the time range, which is
    * exactly what lets Spark EVICT buffered rows from both sides' join
    * state (an equi-only condition on two streams would buffer
    * forever — the stream-join analog of the unbounded-state mistake).
    * Inner join ⇒ results are emitted as soon as both sides arrive;
    * correctness vs the batch twin is spec-checked. */
  def purchaseViewJoin(events: DataFrame, watermark: String = "30 minutes",
                       windowMinutes: Int = 10): DataFrame = {
    val purchases = events.where("event_type = 'purchase'")
      .selectExpr("user_id AS p_user", "ts AS p_ts", "event_id AS purchase_id")
      .withWatermark("p_ts", watermark)
    val views = events.where("event_type = 'view'")
      .selectExpr("user_id AS v_user", "ts AS v_ts", "event_id AS view_id")
      .withWatermark("v_ts", watermark)
    purchases.join(views, expr(
      s"p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL $windowMinutes MINUTES AND p_ts"))
      .select(col("purchase_id"), col("view_id"))
  }

  def streamingDedup(stream: DataFrame, keyCols: Seq[String],
                     eventTimeCol: String, watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** T1: incremental append sink. Each micro-batch is anti-joined against
    * the keys already present in `targetPath`, so re-delivered rows are
    * ignored — the reference's re-run-safety filter, generalized. The
    * checkpoint makes restarts resume, not reprocess.
    *
    * The target is laid out partitioned by a key-hash bucket (`__kb`,
    * `numBuckets` directories), and each batch reads back ONLY the
    * buckets its own keys hash into — partition pruning makes the
    * per-batch lookup O(batch's share of the target), not O(target):
    * re-reading the whole target per micro-batch is the scale
    * anti-pattern this layout exists to avoid. `__kb` is an internal
    * column visible in the target schema (the price of pruning without
    * a MERGE-capable table format).
    *
    * Target existence is checked explicitly (Hadoop FS) — a transient
    * READ failure of an existing target must fail the batch, not be
    * mistaken for "first write" and silently duplicate rows. The empty
    * fallback takes the key's type from the batch schema. */
  def incrementalAppend(stream: DataFrame, keyCol: String,
                        targetPath: String, checkpointPath: String,
                        numBuckets: Int = 16): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val withB = batch.withColumn("__kb",
          pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)))
        val buckets = withB.select("__kb").distinct().collect().map(_.getLong(0))
        if (buckets.nonEmpty) {
          val path = new org.apache.hadoop.fs.Path(targetPath)
          val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // A target created by an older (unpartitioned) layout has no
          // __kb column: pruning on it would throw AnalysisException, and
          // appending partitioned files into it would mix layouts. Detect
          // once per batch; legacy targets get a full-target key read
          // (correct, just unpruned) and an unpartitioned append, so the
          // target's layout is never mixed.
          val existing = if (fs.exists(path)) Some(spark.read.parquet(targetPath)) else None
          val partitioned = existing.forall(_.columns.contains("__kb"))
          val existingKeys = existing match {
            case Some(e) if partitioned =>
              e.where(col("__kb").isin(buckets.map(Long.box): _*)) // partition pruning
                .select(keyCol)
            case Some(e) => e.select(keyCol)
            case None    => withB.select(keyCol).limit(0)
          }
          val novel = withB.join(existingKeys, Seq(keyCol), "left_anti")
          if (partitioned)
            novel.write.mode("append").partitionBy("__kb").parquet(targetPath)
          else
            novel.drop("__kb").write.mode("append").parquet(targetPath)
        }
      }
}
