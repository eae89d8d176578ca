package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** File-source streaming view of the events table. The stream declares
    * the file's actual on-disk schema (taken from a batch read — the
    * driver has shipped nanos-long and micros encodings across testdata
    * generations), then normalizes `ts` exactly like the batch loader. */
  private def streamingEvents(dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = spark.read.parquet(dir).schema
    Tables.adaptEventsTs(spark.readStream.schema(onDisk).parquet(dir))
  }

  private def stageEvents(): String = {
    val d = Files.createTempDirectory("events_stream").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(d, "part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d
  }

  test("streaming PSI monitor matches an independently-formulated batch twin per hour") {
    val dir = stageEvents()
    val batchEvents = Tables.events(spark, "/root/testdata/sf0.001")
    val ref = EventStream.psiReference(batchEvents) // frozen reference
    val q = EventStream.psiMonitor(streamingEvents(dir), ref)
      .writeStream.outputMode("complete").format("memory").queryName("psi_stream")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("psi_stream")
    // batch twin from RAW columns: per-hour bucket histogram + the PSI
    // formula spelled out in SQL, no shared operator code
    val r = ref.collect().head
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val refN = (0 until 10).map(b => r.getLong(2 + b))
    val refTot = r.getLong(12)
    val hourBuckets = batchEvents.selectExpr(
      "date_trunc('hour', ts) AS hour",
      s"greatest(0L, least((cast(round(value * 100) as bigint) - ${lo}L) * 10 div (${hi}L - ${lo}L + 1), 9L)) AS bucket")
      .groupBy("hour", "bucket").count()
      .collect().groupBy(_.getAs[java.sql.Timestamp](0))
    val expect = hourBuckets.map { case (hour, rows) =>
      val n = Array.fill(10)(0L)
      rows.foreach(r2 => n(r2.getLong(1).toInt) = r2.getLong(2))
      val tot = n.sum
      val psi = (0 until 10).map { b =>
        val p = (n(b) + 1).toDouble / (tot + 10)
        val qq = (refN(b) + 1).toDouble / (refTot + 10)
        math.round(1e9 * (p - qq) * math.log(p / qq))
      }.sum
      hour -> (tot, psi)
    }
    val got = streamed.collect()
      .map(r2 => r2.getAs[java.sql.Timestamp](0) -> (r2.getLong(1), r2.getLong(2))).toMap
    assert(got.nonEmpty && got == expect)
    // the full-stream distribution IS the reference here, so every
    // hour's drift must be small; a shifted synthetic hour must spike
    import spark.implicits._
    val shifted = (0 until 200).map { i =>
      (java.sql.Timestamp.valueOf("2030-01-01 05:00:01"), hi / 100.0)
    }.toDF("ts", "value")
    val spike = EventStream.psiMonitor(shifted, ref) // batch execution: same plan sans watermark state
      .collect().head.getLong(2)
    assert(spike > 250000000L, s"planted shift PSI was $spike")
  }

  test("streaming anomaly scoring equals the batch flags (stream-static join, same operator)") {
    import graft.operators.Anomaly
    val dir = stageEvents()
    val batchEvents = Tables.events(spark, "/root/testdata/sf0.001")
    val model = Anomaly.stats(batchEvents) // frozen model side
    val q = Anomaly.flagAgainst(streamingEvents(dir), model)
      .writeStream.outputMode("append").format("memory").queryName("anom_stream")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("anom_stream")
    val batch = Anomaly.flagAgainst(batchEvents, model)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }

  test("streaming corpus ingest rejects near-dups online across micro-batches and restarts") {
    import graft.streaming.CorpusIngest
    import spark.implicits._
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val yfill = (1 to 60).map(i => s"y$i").mkString(" ")
    val stage = Files.createTempDirectory("ingest_src").toString
    val index = Files.createTempDirectory("ingest_idx").toString + "/idx"
    val corpus = Files.createTempDirectory("ingest_out").toString + "/corpus"
    val ckpt = Files.createTempDirectory("ingest_ckpt").toString
    def addFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("ingest_tmp").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(stage, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(stage)
      val q = CorpusIngest.start(stream, index, corpus, ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    // batch 1: 2 ~ 1 (within-batch dup → 2 drops), 4 unrelated
    addFile("b1.parquet", Seq(
      (1L, s"$filler alpha beta"), (2L, s"$filler alpha gamma"),
      (4L, (1 to 60).map(i => s"x$i").mkString(" "))))
    run()
    // batch 2 in a FRESH run off the same checkpoint: 17 ~ kept doc 1
    // (cross-batch dup → drops against the index), 37 ~ 27 (within)
    addFile("b2.parquet", Seq(
      (17L, s"$filler alpha nu"), (27L, s"$yfill sigma tau"),
      (37L, s"$yfill sigma phi")))
    run()
    val kept = spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 27L), s"kept=$kept")
    // the index tracks exactly the kept docs — batch 3 would dedup
    // against all of them without ever rescanning the corpus text
    val indexed = spark.read.parquet(s"$index/sh").select("doc_id")
      .as[Long].collect().toSet
    assert(indexed == Set(1L, 4L, 27L), s"indexed=$indexed")
  }

  test("streaming view maintenance: per-batch deltas converge to direct re-aggregation") {
    // the operational loop around Diff.maintainGroupedAgg (q122): a
    // change feed arrives in micro-batches and each batch's additive
    // deltas are applied onto the PERSISTED view state — the base table
    // is never touched. Deltas are associative, so however the feed is
    // micro-batched the final state must equal one-shot re-aggregation.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Diff
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val viewPath = Files.createTempDirectory("ivm_view").toString
    Seq(("g1", 2L, 30L), ("g2", 1L, 30L)).toDF("g", "n", "v")
      .write.mode("overwrite").parquet(viewPath)
    val q = mem.toDF.toDF("change_type", "g", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val next = Diff.maintainGroupedAgg(
          spark.read.parquet(viewPath), batch, "g", "v")
        // materialize BEFORE overwriting the state being read
        val tmp = viewPath + "_next"
        next.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(viewPath)
        ()
      }.start()
    mem.addData(("insert", "g1", 5L), ("delete", "g1", 10L))
    q.processAllAvailable()
    // a group MOVE split across a later batch: debit g2, credit g3
    mem.addData(("update_pre", "g2", 30L), ("update_post", "g3", 31L))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(viewPath).orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g1", 2L, 25L), ("g3", 1L, 31L)),
      s"streamed view state diverged: $got")
  }

  test("stream-stream interval join equals the batch range join") {
    val dir = stageEvents()
    val q = EventStream.purchaseViewJoin(streamingEvents(dir))
      .writeStream.outputMode("append").format("memory").queryName("ssj_stream")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj_stream")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val batch = ev.where("event_type = 'purchase'")
      .selectExpr("user_id AS p_user", "unix_micros(ts) AS pt", "event_id AS purchase_id")
      .join(ev.where("event_type = 'view'")
        .selectExpr("user_id AS v_user", "unix_micros(ts) AS vt", "event_id AS view_id"),
        expr("p_user = v_user AND vt BETWEEN pt - 600000000 AND pt"))
      .select("purchase_id", "view_id")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }

  test("T2 x X4: VARIANT extraction through the watermarked rollup matches batch") {
    val dir = stageEvents()
    val q = EventStream.variantHourlyRollup(streamingEvents(dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("variant_rollup_test")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("variant_rollup_test")
      .select("hour", "event_type", "n_events", "value_cents")
    // batch twin from the RAW columns — if the parse→variant_get hop
    // dropped, retyped, or shifted anything, the rollups diverge
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100).cast("long")).as("value_cents"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("T2 x X4: a malformed blob NULLs out instead of killing the stream") {
    import spark.implicits._
    // event_type containing a quote makes the assembled doc invalid JSON
    // for that row only; try_parse_json must NULL it, not throw
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 10:15:00"), "click", 10.0),
      (java.sql.Timestamp.valueOf("2026-01-01 10:20:00"), "bad\"quote", 99.0))
    val df = rows.toDF("ts", "event_type", "value")
    val out = EventStream.variantHourlyRollup(df)
      .collect().map(r => Option(r.getString(1)) -> Option(r.get(3))).toMap
    // the good row rolls up normally; the malformed row survives as a
    // NULL-keyed group with a NULL sum (its probes all NULLed)
    assert(out(Some("click")) == Some(1000L))
    assert(out.contains(None) && out(None).isEmpty)
  }

  test("T2: streaming hourly rollup matches the batch q17 aggregation") {
    val dir = stageEvents()
    val q = EventStream.hourlyRollup(streamingEvents(dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_test")
      .start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("rollup_test")
      .select("hour", "event_type", "n_events", "value_cents")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100).cast("long")).as("value_cents"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("curation sampling runs UNCHANGED on a stream and matches the batch result") {
    // stratifiedSample is a stateless transform, so the same function
    // works on readStream input with no modification — the stream/batch
    // unification claim for the curation layer, proven end-to-end
    val d = Files.createTempDirectory("docs_stream").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      Paths.get(d, "part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema).parquet(d)
    val q = graft.operators.Curation.stratifiedSample(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sample_stream")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sample_stream")
    val batch = graft.operators.Curation.stratifiedSample(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("stateful flatMapGroupsWithState sessionizer matches the q35 window formulation") {
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts", "event_id")
    val stateful = EventStream.sessionizeStateful(batch)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val q35 = SparkEntry.queries("q35_sessionize")(spark, "/root/testdata/sf0.001")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    assert(stateful.except(q35).count() == 0 && q35.except(stateful).count() == 0)
  }

  test("stateful sessionizer keeps ONE session ordinal across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("sess_batches").toString
    val t0 = 1700000000000000L // µs
    // the file source doesn't recurse into write.parquet's output dirs —
    // stage each batch as a flat file at the top level
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("sess_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, name), StandardCopyOption.REPLACE_EXISTING)
    }
    def eventsDf(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("user_id", "us", "event_id")
        .selectExpr("user_id", "timestamp_micros(us) AS ts", "event_id")
    // batch 1: user 7, one event at t0
    stage(eventsDf(Seq((7L, t0, 1L))), "b1.parquet")
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG")
      .parquet(src)
    val q = EventStream.sessionizeStateful(stream)
      .writeStream.outputMode("append").format("memory").queryName("sess_frag")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    q.processAllAvailable()
    // batch 2: same user, 5 minutes later — INSIDE the 30-minute gap, so
    // this must be a fragment of the SAME session id (= the session's
    // start time), plus a later event outside the gap opening a second
    // session whose id is its own start time
    stage(eventsDf(Seq((7L, t0 + 300L * 1000000L, 2L), (7L, t0 + 3600L * 1000000L, 3L))),
      "b2.parquet")
    q.processAllAvailable(); q.stop()
    val frags = spark.table("sess_frag").orderBy("sess", "n_events")
      .collect().map(r => (r.getLong(1), r.getLong(2))) // (sess, n)
    // fragments: (t0,1) from batch1, (t0,1) continuation + (t0+1h,1)
    assert(frags.toSeq == Seq((t0, 1L), (t0, 1L), (t0 + 3600L * 1000000L, 1L)),
      s"got ${frags.toSeq}")
  }

  test("sessionizer state is EVICTED once the watermark passes the gap deadline") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("sess_evict").toString
    val t0 = 1700000000000000L // µs
    def eventsDf(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("user_id", "us", "event_id")
        .selectExpr("user_id", "timestamp_micros(us) AS ts", "event_id")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("sess_evict_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(src, name), StandardCopyOption.REPLACE_EXISTING)
    }
    stage(eventsDf(Seq((7L, t0, 1L))), "b1.parquet")
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG").parquet(src)
    val q = EventStream.sessionizeStateful(stream)
      .writeStream.outputMode("append").format("memory").queryName("sess_evict")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    q.processAllAvailable()
    // batch 2 advances event time 10 h: after it commits, the watermark
    // (2 h delay) sits far past user 7's 30-min gap deadline
    stage(eventsDf(Seq((8L, t0 + 36000L * 1000000L, 2L))), "b2.parquet")
    q.processAllAvailable()
    // batch 3 triggers timeout processing under the advanced watermark
    stage(eventsDf(Seq((9L, t0 + 36001L * 1000000L, 3L))), "b3.parquet")
    q.processAllAvailable()
    val stateRows = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators.head.numRowsTotal
    q.stop()
    // user 7's state evicted; users 8 and 9 still open
    assert(stateRows == 2, s"expected 2 live state rows after eviction, got $stateRows")
    // eviction emits nothing: exactly the three observed fragments
    assert(spark.table("sess_evict").count() == 3)
  }

  test("session_window sessionization agrees with the gap-based session count") {
    val sw = EventStream.sessionWindows(Tables.events(spark, "/root/testdata/sf0.001"))
    val q35 = SparkEntry.queries("q35_sessionize")(spark, "/root/testdata/sf0.001")
    assert(sw.count() == q35.count()) // same number of (user, session) rows
    // and per-session sizes agree in aggregate
    assert(sw.agg(sum("n_events")).collect()(0).getLong(0) ==
           q35.agg(sum("n_events")).collect()(0).getLong(0))
  }

  test("session_window runs as a streaming query with watermark") {
    val dir = stageEvents()
    val q = streamingEvents(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.outputMode("complete").format("memory").queryName("sess_stream").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("sess_stream").count() > 0)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = stageEvents()
    // double the input: same file twice -> every event delivered twice
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "dup.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.streamingDedup(streamingEvents(dir), Seq("event_id"), "ts")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("dedup_stream")
    assert(out.count() == 1000) // 2000 delivered, 1000 distinct
    assert(out.select("event_id").distinct().count() == 1000)
  }

  test("T1: incremental append processes each key once across restarts and redeliveries") {
    val src = stageEvents()
    val target = Files.createTempDirectory("inc_target").toString + "/t"
    val ckpt = Files.createTempDirectory("inc_ckpt").toString

    def runOnce(): Unit = {
      val q = EventStream.incrementalAppend(
        streamingEvents(src), "event_id", target, ckpt).start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = spark.read.parquet(target).count()
    assert(n1 == 1000)

    // restart with same checkpoint: no reprocessing
    runOnce()
    assert(spark.read.parquet(target).count() == n1)

    // redelivery: same rows in a NEW file (new filename = new source
    // offset, so the batch fires) -> anti-join keeps the table unique
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(src, "part-1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    runOnce()
    val after = spark.read.parquet(target)
    assert(after.count() == n1)
    assert(after.select("event_id").distinct().count() == n1)
  }
}
