package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftInputPartition, GraftReaderFactory, GraftScan, GraftStore}

/** DataSource V2 connector (`graft-store`): scan planning, zone-map data
  * skipping, filter/column pushdown, two-phase write commit, and the
  * micro-batch replay stream. */
class GraftSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  private def loadDocs(name: String): Unit =
    GraftStore.load(name, docs, shardKey = Some("doc_id"), numSegments = 8)

  private def read(name: String) =
    spark.read.format("graft-store").option("name", name).load()

  private def graftScan(df: org.apache.spark.sql.DataFrame): GraftScan = {
    val scans = org.apache.spark.sql.graft.PlanBridge.executedPlan(df).collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.size == 1, s"expected one BatchScan, got $scans")
    scans.head.asInstanceOf[GraftScan]
  }

  test("round trip: store scan equals the parquet source") {
    loadDocs("v2_docs")
    val back = read("v2_docs")
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
  }

  test("filter pushdown prunes segments via zone maps and yields exact rows") {
    loadDocs("v2_docs")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cut = maxId - 10
    GraftStore.resetCounters()
    val filtered = read("v2_docs").where(col("doc_id") > cut)
    val got = filtered.collect().map(_.getLong(0)).sorted
    val want = docs.where(col("doc_id") > cut).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // doc_id is the shard key: 8 range segments, the predicate touches
    // only the last — at least 6 of 8 must be skipped without being read
    assert(GraftStore.segmentsSkipped.get() >= 6,
      s"zone maps should skip most segments, skipped=${GraftStore.segmentsSkipped.get()}")
    assert(GraftStore.segmentsRead.get() <= 2)
    // and the scan claims the filter (no Spark-side residual needed)
    val scan = graftScan(filtered)
    assert(scan.description().contains("GreaterThan(doc_id"))
  }

  test("column pruning reaches the reader") {
    loadDocs("v2_docs")
    val pruned = read("v2_docs").select("lang")
    assert(graftScan(pruned).readSchema().fieldNames.toSeq == Seq("lang"))
    assert(pruned.distinct().count() == docs.select("lang").distinct().count())
  }

  test("unsupported predicates stay as Spark residuals and still evaluate") {
    loadDocs("v2_docs")
    val f = read("v2_docs").where(col("text").contains("the") && col("doc_id") >= 0)
    val want = docs.where(col("text").contains("the") && col("doc_id") >= 0).count()
    assert(f.count() == want)
    val scan = graftScan(f)
    assert(scan.description().contains("GreaterThanOrEqual(doc_id"))
    assert(!scan.description().contains("StringContains"),
      "contains() is not claimed; Spark must keep it as a residual filter")
  }

  test("reported post-pruning statistics let the planner broadcast the store side") {
    loadDocs("v2_docs")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val conf = spark.conf
    val old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // threshold below the parquet side's size but above the PRUNED
      // store scan's reported size: only correct DSv2 stats make the
      // broadcast happen (the DSv2 default without stats is
      // defaultSizeInBytes = "assume huge" => sort-merge)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
      val tiny = read("v2_docs").where(col("doc_id") > maxId - 5)
        .selectExpr("doc_id", "lang AS l2")
      val joined = docs.join(tiny, "doc_id")
      val bhj = SparkTestSession.collectExec(joined) {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty, "pruned store scan should broadcast under its reported stats")
      assert(joined.count() == 5)
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("runtime filtering re-prunes segments from the join side's actual keys") {
    loadDocs("v2_docs")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    // NO static predicate on the store side: only the dim join can prune
    val fact = read("v2_docs")
    val dim = docs.where(col("doc_id") > maxId - 5) // selective filtering side
      .select(col("doc_id"), lit("d").as("tag"))
    GraftStore.resetCounters()
    val joined = fact.join(dim, "doc_id")
    assert(joined.count() == 5)
    assert(GraftStore.segmentsSkipped.get() > 0,
      s"runtime filter should prune segments, skipped=${GraftStore.segmentsSkipped.get()} " +
        s"read=${GraftStore.segmentsRead.get()}")
  }

  test("DSv2 write: overwrite and append commit atomically through the driver") {
    val name = "v2_write"
    docs.limit(100).write.format("graft-store").option("name", name)
      .mode("overwrite").save()
    assert(read(name).count() == 100)
    docs.where("doc_id >= 100").limit(50).write.format("graft-store")
      .option("name", name).mode("append").save()
    assert(read(name).count() == 150)
    // overwrite truncates, not appends
    docs.limit(20).write.format("graft-store").option("name", name)
      .mode("overwrite").save()
    assert(read(name).count() == 20)
  }

  test("MIN/MAX/COUNT(*) are answered from store metadata with zero segment reads") {
    loadDocs("v2_docs")
    GraftStore.resetCounters()
    val agg = read("v2_docs").agg(
      count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"),
      max("n_chars").as("mc"))
    val got = agg.head()
    val want = docs.agg(count(lit(1)), min("doc_id"), max("doc_id"), max("n_chars")).head()
    assert(got == want)
    // the proof: no segment was planned or read — the values came from
    // zone maps and segment row counts alone
    assert(GraftStore.segmentsRead.get() == 0,
      s"metadata-only agg must not read segments, read=${GraftStore.segmentsRead.get()}")
    // and no aggregate exec remains above the scan (complete pushdown)
    assert(SparkTestSession.collectExec(agg) {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }.isEmpty, "complete pushdown should leave no HashAggregate in the plan")
  }

  test("aggregate pushdown declines when a filter is present (zone maps can't subset)") {
    loadDocs("v2_docs")
    val filtered = read("v2_docs").where(col("doc_id") > 100)
      .agg(min("n_chars"), max("n_chars"), count(lit(1)))
    val want = docs.where(col("doc_id") > 100)
      .agg(min("n_chars"), max("n_chars"), count(lit(1))).head()
    assert(filtered.head() == want) // correct via the normal scan path
  }

  test("storage-partitioned join: co-clustered collections join with ZERO shuffles") {
    // two collections clustered on the join key; the scans report
    // KeyGroupedPartitioning, so the join needs no exchange on either
    // side. Broadcast is disabled so the shuffle-free plan can only
    // come from the reported partitioning, not from a broadcast.
    GraftStore.loadClustered("spj_docs", docs, "lang")
    val stats = docs.groupBy("lang")
      .agg(expr("sum(n_chars) div count(1)").as("avg_chars"))
    GraftStore.loadClustered("spj_stats", stats, "lang")
    val withConf = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = withConf.map { case (k, _) => k -> spark.conf.getOption(k) }
    withConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = read("spj_docs").join(read("spj_stats"), "lang")
        .where(col("n_chars") > col("avg_chars"))
        .select("lang", "doc_id", "n_chars", "avg_chars")
      val got = joined.orderBy("doc_id").collect()
      assert(SparkTestSession.shuffles(joined) == 0,
        "co-clustered storage-partitioned join must plan no exchange")

      // same result as the plain parquet formulation
      val want = docs.join(stats, "lang")
        .where(col("n_chars") > col("avg_chars"))
        .select("lang", "doc_id", "n_chars", "avg_chars")
        .orderBy("doc_id").collect()
      assert(got.toSeq == want.toSeq && got.nonEmpty)

      // negative control: the same join against a range-sharded (not
      // cluster-keyed) collection must shuffle — the zero above is the
      // reported partitioning at work, not an artifact of data size
      loadDocs("spj_plain")
      val control = read("spj_plain").join(read("spj_stats"), "lang")
        .where(col("n_chars") > col("avg_chars"))
      control.collect()
      assert(SparkTestSession.shuffles(control) > 0,
        "unclustered side must still require an exchange")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("flat projections read as columnar batches; nested schemas fall back to rows") {
    import org.apache.spark.sql.execution.ColumnarToRowExec
    loadDocs("v2_docs")
    // documents is all flat types: the scan must report columnar and the
    // plan must carry the ColumnarToRow boundary
    val flat = read("v2_docs").where(col("n_chars") >= 100)
    val got = flat.orderBy("doc_id").collect()
    val scans = SparkTestSession.collectExec(flat) {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.forall(_.supportsColumnar),
      "flat-typed store scan should be vectorized")
    assert(SparkTestSession.collectExec(flat) {
      case c: ColumnarToRowExec => c
    }.nonEmpty, "columnar scan needs a ColumnarToRow boundary in the plan")
    val want = docs.where(col("n_chars") >= 100).orderBy("doc_id").collect()
    assert(got.toSeq == want.toSeq && got.nonEmpty)

    // an array column in the projection cannot vectorize: row fallback,
    // same results
    val emb = Tables.embeddings(spark, sf)
    GraftStore.load("v2_emb", emb, shardKey = Some("vec_id"), numSegments = 4)
    val nested = read("v2_emb")
    val gotN = nested.orderBy("vec_id").collect()
    val nestedScans = SparkTestSession.collectExec(nested) {
      case b: BatchScanExec => b
    }
    assert(nestedScans.nonEmpty && !nestedScans.exists(_.supportsColumnar),
      "array-typed projection must fall back to the row reader")
    assert(gotN.toSeq == emb.orderBy("vec_id").collect().toSeq)

    // drive the columnar reader directly: the batches' row counts must
    // account for exactly the partition's filtered rows, every batch
    // bounded by the 1024 vector allocation
    val coll = GraftStore.get("v2_docs")
    val schema = coll.schema
    val fac = new GraftReaderFactory(schema, schema, Array.empty)
    coll.segments.filter(_.rows.nonEmpty).foreach { seg =>
      val part = GraftInputPartition(seg.rows)
      assert(fac.supportColumnarReads(part))
      val reader = fac.createColumnarReader(part)
      var total = 0L
      while (reader.next()) {
        val b = reader.get()
        assert(b.numRows > 0 && b.numRows <= 1024)
        total += b.numRows
      }
      reader.close()
      assert(total == seg.rows.size,
        s"columnar batches must cover the partition: $total vs ${seg.rows.size}")
    }
  }

  test("edge cases: empty collection and a filter that prunes every segment") {
    GraftStore.register("v2_empty", docs.schema, Seq.empty, Some("doc_id"))
    assert(read("v2_empty").count() == 0)

    loadDocs("v2_docs")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    // predicate beyond every zone map: all segments pruned, zero rows
    GraftStore.resetCounters()
    assert(read("v2_docs").where(col("doc_id") > maxId + 1000).count() == 0)
    assert(GraftStore.segmentsRead.get() == 0,
      s"no segment should survive, read=${GraftStore.segmentsRead.get()}")
  }

  test("micro-batch stream: bounded batches, batch/stream agreement, durable offsets") {
    val name = "v2_stream"
    val base = docs.where("doc_id < 400")
    GraftStore.load(name, base, shardKey = Some("doc_id"), numSegments = 4)
    val ckpt = Files.createTempDirectory("graft_v2_ckpt").toString

    def runOnce(): Int = {
      val q = spark.readStream.format("graft-store")
        .option("name", name).option("batchrows", "64").load()
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("v2_sink")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive)
      q.recentProgress.count(_.numInputRows > 0)
    }

    val batchesSeen = runOnce()
    val streamed = spark.table("v2_sink").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = base.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // admission control: 400 backlog rows under maxRows=64 must replay
    // as multiple bounded micro-batches, not one catch-up batch
    assert(batchesSeen >= 4, s"expected >=4 bounded micro-batches, saw $batchesSeen")

    // append rows AFTER the watermark of consumed offsets (larger shard
    // keys keep the frozen prefix order stable), restart from the same
    // checkpoint: only the delta is replayed, totals converge
    GraftStore.append(name, base.schema,
      docs.where("doc_id >= 400").collect().toIndexedSeq, numSegments = 4)
    runOnce()
    val streamed2 = spark.table("v2_sink").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch2 = docs.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed2 == batch2)
  }

  test("_segment metadata column reports the (pre-pruning) segment ordinal") {
    loadDocs("v2_segcol")
    // every one of the 8 segments is represented, ordinals 0..7
    val segs = read("v2_segcol").select(col("_segment")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(segs == (0 until 8), s"got $segs")
    // pruning keeps ORIGINAL ordinals: the lowest doc_id range is segment 0
    val seg0 = read("v2_segcol").where(col("doc_id") < 10)
      .select(col("_segment")).distinct().collect().map(_.getInt(0)).toSeq
    assert(seg0 == Seq(0), s"got $seg0")
    // joins with data columns (the skew-debugging query shape)
    val perSeg = read("v2_segcol").groupBy("_segment")
      .agg(count(lit(1)).as("n")).collect()
    assert(perSeg.length == 8 && perSeg.map(_.getLong(1)).sum == docs.count())
  }

  test("scan pruning evidence rides DSv2 custom metrics (SQL metric channel)") {
    loadDocs("v2_metrics")
    val df = read("v2_metrics").where(col("doc_id") >= 400)
    assert(df.collect().nonEmpty)
    val scans = SparkTestSession.collectExec(df) { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    // supportedCustomMetrics landed in the exec node's SQLMetric map
    val m = scans.head.metrics
    assert(m.contains("graftSegmentsRead") && m.contains("graftSegmentsSkipped"),
      s"scan must expose segment metrics, has ${m.keys}")
    // the values the engine pulls over that channel
    // (Scan.reportDriverMetrics — post-execution, so the final pruning
    // decision): every metric name resolves, skip+read account for all
    // 8 segments, and the selective range filter skipped most
    val reported = scans.head.scan.asInstanceOf[GraftScan]
      .reportDriverMetrics().map(t => t.name -> t.value).toMap
    assert(reported.keySet == Set("graftSegmentsRead", "graftSegmentsSkipped"))
    assert(reported.keySet.subsetOf(m.keySet))
    assert(reported("graftSegmentsSkipped") > 0,
      s"selective range filter must skip segments via the metric channel: $reported")
    assert(reported("graftSegmentsRead") > 0)
    assert(reported("graftSegmentsRead") + reported("graftSegmentsSkipped") == 8)
  }

  test("write-side distribution: sharded connector writes plan a range exchange + sort and land pruning zone maps") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener

    val name = "v2_dist"
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // scrambled input: the declared distribution, not the input layout,
      // must produce the clustered arrival order
      docs.repartition(7).write.format("graft-store").option("name", name)
        .option("shardkey", "doc_id").mode("overwrite").save()
      def hit: Option[String] = {
        import scala.jdk.CollectionConverters._
        captured.iterator.asScala.find(s =>
          s.contains("rangepartitioning(doc_id") && s.contains("Sort [doc_id"))
      }
      val deadline = System.currentTimeMillis() + 30000
      while (hit.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      assert(hit.nonEmpty,
        "declared ordered distribution must plan a range exchange + sort " +
          s"before the write; captured plans:\n${captured.iterator.asScala.mkString("\n---\n")}")
    } finally spark.listenerManager.unregister(listener)

    // the landed collection carries the shard layout and its zone maps prune
    val coll = GraftStore.get(name)
    assert(coll.shardKey.contains("doc_id"))
    GraftStore.resetCounters()
    read(name).where(col("doc_id") < 50).collect()
    assert(GraftStore.segmentsSkipped.get() > 0,
      s"sharded-write zone maps must prune, skipped=${GraftStore.segmentsSkipped.get()}")

    // appends inherit the existing layout without re-stating the key
    docs.write.format("graft-store").option("name", name).mode("append").save()
    assert(GraftStore.get(name).shardKey.contains("doc_id"))
    assert(GraftStore.get(name).rows.size == docs.count() * 2)
  }

  test("order-epoch guard: a reordering rewrite fails a running stream loudly; tail appends don't") {
    import graft.sources.v2.GraftMicroBatchStream
    val name = "v2_epoch_guard"
    val base = docs.where("doc_id < 200")
    GraftStore.load(name, base, shardKey = Some("doc_id"), numSegments = 4)
    val stream = new GraftMicroBatchStream(name, base.schema, base.schema,
      Array.empty, 64)
    val n0 = stream.latestOffset()
    // tail append (keys ≥ current max): order-preserving, stream lives on
    GraftStore.append(name, base.schema,
      docs.where("doc_id >= 200 AND doc_id < 250").collect().toIndexedSeq,
      numSegments = 4)
    assert(stream.latestOffset().asInstanceOf[graft.sources.v2.GraftOffset].rowIndex >
      n0.asInstanceOf[graft.sources.v2.GraftOffset].rowIndex)
    // MID-RANGE append: the re-shard's sort interleaves into the consumed
    // prefix — the next poll must fail loudly, not silently re-deliver
    GraftStore.append(name, base.schema,
      docs.where("doc_id >= 250 AND doc_id < 260")
        .selectExpr("doc_id - 200 AS doc_id", "text", "lang", "source", "n_chars")
        .collect().toIndexedSeq, numSegments = 4)
    assertThrows[IllegalStateException] { stream.latestOffset() }
    // and a checkpointed offset from the old epoch is rejected on restart
    val restarted = new GraftMicroBatchStream(name, base.schema, base.schema,
      Array.empty, 64)
    assertThrows[IllegalStateException] { restarted.deserializeOffset(n0.json()) }
  }

  test("streaming commits keep the shard layout (declared or inherited)") {
    val name = "v2_shardkeep"
    GraftStore.drop(name)
    val rows = docs.limit(100).collect().toIndexedSeq
    // fresh collection: the write's declared shard key lands
    assert(GraftStore.commitEpoch(name, docs.schema, rows, 0L,
      truncate = false, shardKey = Some("doc_id")))
    assert(GraftStore.get(name).shardKey.contains("doc_id"))
    // Complete-mode truncate on an existing sharded collection keeps it
    assert(GraftStore.commitEpoch(name, docs.schema, rows, 1L, truncate = true))
    assert(GraftStore.get(name).shardKey.contains("doc_id"),
      "truncate epoch must not strip the zone-map layout")
    GraftStore.drop(name)
  }

  test("streaming write: store-to-store round trip is exactly-once across restart") {
    val src = "v2_wsrc"
    val dst = "v2_wdst"
    val base = docs.where("doc_id < 300")
    GraftStore.load(src, base, shardKey = Some("doc_id"), numSegments = 4)
    GraftStore.drop(dst)
    val ckpt = Files.createTempDirectory("graft_v2_wckpt").toString

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-store")
        .option("name", src).option("batchrows", "64").load()
        .writeStream.format("graft-store").option("name", dst)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    runOnce()
    val dstDf = spark.read.format("graft-store").option("name", dst).load()
    assert(dstDf.count() == base.count(),
      "every source row lands in the store exactly once")

    // append a tail delta to the source (larger shard keys keep the
    // consumed prefix stable), restart from the same checkpoint: the
    // delta commits, nothing already committed duplicates
    GraftStore.append(src, base.schema,
      docs.where("doc_id >= 300 AND doc_id < 400").collect().toIndexedSeq,
      numSegments = 4)
    runOnce()
    val got = spark.read.format("graft-store").option("name", dst).load()
      .orderBy("doc_id").collect()
    val want = docs.where("doc_id < 400").orderBy("doc_id").collect()
    assert(got.toSeq == want.toSeq,
      "exactly-once across restart: no lost and no duplicated rows")

    // the epoch ledger directly: a re-delivered epoch (same query id)
    // commits as a no-op
    val before = GraftStore.get(dst).rows.size
    assert(GraftStore.commitEpoch(dst, base.schema,
      Seq.empty, epochId = 99L, truncate = false, queryId = "ledger-probe"))
    assert(!GraftStore.commitEpoch(dst, base.schema,
      base.collect().toIndexedSeq, epochId = 99L, truncate = false,
      queryId = "ledger-probe"))
    assert(GraftStore.get(dst).rows.size == before,
      "replaying an already-committed epoch must change nothing")
  }

  test("epoch ledger is keyed by streaming query id, not just collection") {
    val name = "v2_qid"
    GraftStore.drop(name)
    val rows = docs.limit(10).collect().toIndexedSeq
    // query A commits epoch 0
    assert(GraftStore.commitEpoch(name, docs.schema, rows, 0L,
      truncate = false, queryId = "query-A"))
    // a DIFFERENT query writing to the same collection also starts at
    // epoch 0 (fresh checkpoint) — it is a new writer, not a replay
    assert(GraftStore.commitEpoch(name, docs.schema, rows, 0L,
      truncate = false, queryId = "query-B"),
      "a second query's epoch 0 must land, not be skipped as a replay")
    assert(GraftStore.get(name).rows.size == 20)
    // while a true replay (same query, same epoch) stays a no-op
    assert(!GraftStore.commitEpoch(name, docs.schema, rows, 0L,
      truncate = false, queryId = "query-A"))
    assert(GraftStore.get(name).rows.size == 20)
    GraftStore.drop(name)
  }

  test("append preserves the collection's segment count") {
    val name = "v2_segkeep"
    GraftStore.load(name, docs.where("doc_id < 200"),
      shardKey = Some("doc_id"), numSegments = 4)
    assert(GraftStore.get(name).segments.size == 4)
    // default (no explicit numSegments) keeps the 4-segment layout —
    // the DSv2 append commit path relies on this
    GraftStore.append(name, docs.schema,
      docs.where("doc_id >= 200 AND doc_id < 260").collect().toIndexedSeq)
    assert(GraftStore.get(name).segments.size == 4,
      "an append must not silently re-lay a 4-segment collection out as 8")
    GraftStore.drop(name)
  }

  test("row-level commit fails loudly if the collection moved after planning") {
    val name = "v2_stale"
    GraftStore.load(name, docs.where("doc_id < 100"),
      shardKey = Some("doc_id"), numSegments = 2)
    val plannedSegs = GraftStore.get(name).segments
    // a concurrent writer mutates the collection between scan planning
    // and the replace commit
    GraftStore.append(name, docs.schema,
      docs.where("doc_id >= 100 AND doc_id < 110").collect().toIndexedSeq)
    assertThrows[IllegalStateException] {
      GraftStore.commitReplace(name, docs.schema, Set(0), plannedSegs,
        Seq.empty)
    }
    GraftStore.drop(name)
  }
}
