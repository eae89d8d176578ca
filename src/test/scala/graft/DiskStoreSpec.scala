package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftStore

/** Disk-backed segment payloads: collections whose rows live in parquet
  * files while zone maps and the segment manifest stay in driver
  * memory. Proves (1) the distributed ingest path materializes ZERO
  * rows driver-side yet yields the same query results, pruning, and
  * aggregate pushdown as the in-memory store; (2) clustered disk
  * layouts keep the storage-partitioned-join contract; (3) mutations on
  * a disk collection stay disk-backed and exact; (4) every supported
  * value type round-trips through the parquet payload. */
class DiskStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
  private def read(name: String) =
    spark.read.format("graft-store").option("name", name).load()
  private def diskSegments(name: String) =
    GraftStore.get(name).segments.filter(_.count > 0)

  private lazy val dir = Files.createTempDirectory("graft_disk").toString

  private def loadBoth(): Unit = {
    GraftStore.load("dsk_mem", docs, shardKey = Some("doc_id"), numSegments = 8)
    GraftStore.loadDisk("dsk_docs", docs, "doc_id", 8, dir)
  }

  test("loadDisk: parity with the in-memory store, rows live on disk") {
    loadBoth()
    // every non-empty segment is parquet-backed — the driver manifest
    // holds paths + zone maps, not row vectors
    assert(diskSegments("dsk_docs").nonEmpty)
    diskSegments("dsk_docs").foreach { s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows],
        s"expected parquet payload, got ${s.payload.getClass}")
    }
    val (mem, dsk) = (read("dsk_mem"), read("dsk_docs"))
    assert(dsk.schema.fieldNames.toSeq == mem.schema.fieldNames.toSeq)
    assert(dsk.count() == mem.count())
    assert(dsk.except(mem).count() == 0 && mem.except(dsk).count() == 0)
  }

  test("loadDisk: footer-derived zone maps prune segments") {
    loadBoth()
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    GraftStore.resetCounters()
    val filtered = read("dsk_docs").where(col("doc_id") > maxId - 10)
    val got = filtered.collect().map(_.getLong(0)).sorted
    val want = docs.where(col("doc_id") > maxId - 10)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    assert(GraftStore.segmentsSkipped.get() >= 6,
      s"parquet footer zone maps must prune, skipped=${GraftStore.segmentsSkipped.get()}")
    assert(GraftStore.segmentsRead.get() <= 2)
  }

  test("loadDisk: MIN/MAX/COUNT pushdown answers from footer metadata, zero reads") {
    loadBoth()
    GraftStore.resetCounters()
    val agg = read("dsk_docs").agg(
      count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
    val r = agg.head()
    val w = docs.agg(count(lit(1)), min("doc_id"), max("doc_id")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      (w.getLong(0), w.getLong(1), w.getLong(2)))
    assert(GraftStore.segmentsRead.get() == 0,
      "complete aggregate pushdown must not read a segment")
  }

  test("string zones use UTF-8 binary order: supplementary chars never skip wrongly") {
    // ordering law: cmp over strings ≡ unsigned UTF-8 byte order (the
    // order parquet chunk statistics and Spark's UTF8String both use)
    val samples = Seq("", "a", "ab", "z", "é", "퟿", "",
      "�", "😀", "a😀")
    for (x <- samples; y <- samples) {
      val byBytes = java.util.Arrays.compareUnsigned(
        x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      assert(Integer.signum(GraftStore.cmp(x, y)) == Integer.signum(byBytes),
        s"cmp(${x.codePoints().toArray.toSeq}, ${y.codePoints().toArray.toSeq}) " +
          "disagrees with UTF-8 byte order")
    }
    // end-to-end: footer stats order a supplementary-plane string ABOVE
    // U+FFFD; a UTF-16 probe order would call the probe out-of-zone and
    // silently skip the one segment that holds the row
    import spark.implicits._
    val df = Seq((1L, "apple"), (2L, "�-probe"),
      (3L, "😀-emoji"), (4L, "zebra")).toDF("id", "s")
    GraftStore.loadDisk("dsk_utf8", df, "s", 2, dir)
    val got = read("dsk_utf8").where(col("s") === "�-probe").collect()
    assert(got.length == 1 && got(0).getLong(0) == 2L,
      "UTF-8/UTF-16 order mismatch must not zone-skip a matching segment")
  }

  test("MIN/MAX over a zone-less column on a disk collection declines pushdown") {
    import spark.implicits._
    val df = Seq((1L, true), (2L, false), (3L, true)).toDF("id", "flag")
    GraftStore.loadDisk("dsk_nozone", df, "id", 2, dir)
    val agg = read("dsk_nozone").agg(min("flag").as("lo"), max("flag").as("hi"))
    // boolean columns never get footer zones: the scan must DECLINE the
    // metadata answer (probing a disk segment for all-null would stream
    // parquet on the driver during planning) and run a normal
    // distributed aggregate instead
    assert(!agg.queryExecution.executedPlan.toString.contains("metadata-only"),
      "zone-less disk column must not take the metadata aggregate path")
    val r = agg.head()
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }

  test("pruned disk scan never decodes unprojected column chunks (poisoned-chunk proof)") {
    import spark.implicits._
    val df = (1L to 64L).map(i => (i, s"name_$i", "x" * 4096)).toDF("id", "nm", "wide")
    GraftStore.loadDisk("dsk_poison", df, "id", 2, dir)
    // overwrite the `wide` column's chunk BYTES with garbage in every
    // file — footer and the other chunks stay intact. From here on, any
    // read that decodes `wide` throws; a read that skips its chunks
    // cannot tell the difference.
    diskSegments("dsk_poison").foreach { s =>
      val GraftStore.ParquetRows(paths, _, _, _) = s.payload: @unchecked
      paths.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val in = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            path, new org.apache.hadoop.conf.Configuration()))
        val spans = try {
          in.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala.filter(_.getPath.toDotString == "wide")
              .map(c => (c.getStartingPos, c.getTotalSize))
          }.toVector
        } finally in.close()
        assert(spans.nonEmpty)
        val raf = new java.io.RandomAccessFile(new java.io.File(new java.net.URI(
          if (p.startsWith("file:")) p else s"file:$p")), "rw")
        try spans.foreach { case (off, len) =>
          raf.seek(off)
          raf.write(Array.fill(len.toInt)(0x5A.toByte))
        } finally raf.close()
        // drop the local-FS checksum sidecar: the corruption must be
        // visible only to a reader that actually touches those bytes
        val f = new java.io.File(new java.net.URI(
          if (p.startsWith("file:")) p else s"file:$p"))
        new java.io.File(f.getParentFile, "." + f.getName + ".crc").delete()
      }
    }
    // projected scan (id, nm) — with a filter on id — must succeed:
    // the poisoned chunks are outside the read schema
    val got = read("dsk_poison").where(col("id") <= 10).select($"id", $"nm")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == (1L to 10L).map(i => (i, s"name_$i")))
    import graft.sources.v2.GraftParquet
    assert(GraftParquet.lastReadSchema.exists(!_.containsField("wide")),
      "the parquet read schema must exclude the unprojected column")
    // control: a scan that PROJECTS the poisoned column must fail —
    // proof the bytes really are garbage and the pruned path's success
    // was column skipping, not luck
    intercept[org.apache.spark.SparkException] {
      read("dsk_poison").select($"wide").collect()
    }
  }

  test("LIMIT pushdown: a preview plans one covering segment, not the collection") {
    loadBoth()
    GraftStore.resetCounters()
    val got = read("dsk_docs").limit(10).collect()
    assert(got.length == 10)
    // 500 rows / 8 segments ≈ 63 per segment: one segment covers the
    // preview; the other seven must never be planned (or their disk
    // readers opened)
    assert(GraftStore.segmentsRead.get() == 1,
      s"LIMIT 10 must plan a single covering segment, read=${GraftStore.segmentsRead.get()}")
    val plan = read("dsk_docs").limit(10).queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 10"), s"missing PushedLimit in:\n$plan")
  }

  test("TopN pushdown on the shard key: asc takes the prefix, desc the suffix") {
    loadBoth()
    val want = docs.orderBy(col("doc_id").desc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    GraftStore.resetCounters()
    val got = read("dsk_docs").orderBy(col("doc_id").desc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
    assert(GraftStore.segmentsRead.get() == 1,
      s"desc top-5 must plan only the tail segment, read=${GraftStore.segmentsRead.get()}")
    GraftStore.resetCounters()
    val gotAsc = read("dsk_docs").orderBy(col("doc_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(gotAsc == docs.orderBy(col("doc_id")).limit(5).collect().map(_.getLong(0)).toSeq)
    assert(GraftStore.segmentsRead.get() == 1)
    val plan = read("dsk_docs").orderBy(col("doc_id").desc).limit(5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: DESC LIMIT 5"), s"missing PushedTopN in:\n$plan")
    // a filtered limit keeps every surviving segment planned (correct-
    // ness over pruning: the filter may land anywhere) but still stops
    // each partition at k rows
    val f = read("dsk_docs").where(col("lang") =!= "zz").limit(7).collect()
    assert(f.length == 7)
  }

  test("loadClusteredDisk: storage-partitioned join stays exchange-free") {
    GraftStore.loadClusteredDisk("dsk_spj_docs", docs, "lang", dir)
    val stats = docs.groupBy("lang")
      .agg(expr("sum(n_chars) div count(1)").as("avg_chars"))
    GraftStore.loadClusteredDisk("dsk_spj_stats", stats, "lang", dir)
    diskSegments("dsk_spj_docs").foreach(s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows]))

    val withConf = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = withConf.map { case (k, _) => k -> spark.conf.getOption(k) }
    withConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = read("dsk_spj_docs").join(read("dsk_spj_stats"), "lang")
        .where(col("n_chars") > col("avg_chars"))
        .select("lang", "doc_id", "n_chars", "avg_chars")
      val got = joined.orderBy("doc_id").collect()
      assert(SparkTestSession.shuffles(joined) == 0,
        "co-clustered disk collections must join with no exchange")
      val want = docs.join(stats, "lang")
        .where(col("n_chars") > col("avg_chars"))
        .select("lang", "doc_id", "n_chars", "avg_chars")
        .orderBy("doc_id").collect()
      assert(got.toSeq == want.toSeq && got.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("mutations on a disk collection stay disk-backed and exact") {
    GraftStore.loadDisk("dsk_mut", docs, "doc_id", 8, dir)
    val total = docs.count()
    val dropped = docs.where(col("lang") === "en").count()
    assert(dropped > 0)

    // connector-path DELETE (SupportsDelete fast path)
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    spark.sql("DELETE FROM graft_cat.`dsk_mut` WHERE lang = 'en'")
    assert(read("dsk_mut").count() == total - dropped)
    assert(read("dsk_mut").where(col("lang") === "en").count() == 0)

    // payload mode survived the rewrite; layout (8 segments) preserved
    assert(GraftStore.get("dsk_mut").payloadDir.contains(dir))
    diskSegments("dsk_mut").foreach(s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows],
        "mutation must re-spill, not silently fall back to memory"))
    assert(GraftStore.get("dsk_mut").segments.size == 8)

    // appends through the connector keep disk mode too
    docs.where(col("lang") === "en").limit(5)
      .write.format("graft-store").option("name", "dsk_mut").mode("append").save()
    assert(read("dsk_mut").where(col("lang") === "en").count() == 5)
    diskSegments("dsk_mut").foreach(s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows]))
  }

  test("every supported value type round-trips through the parquet payload") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val rows = Seq(
      Row(1L, 7, 1.5, 2.5f, true, "alpha", Array[Byte](1, 2, 3),
        java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456"),
        java.sql.Date.valueOf("2024-03-01")),
      Row(2L, null, null, null, null, null, null, null, null),
      Row(3L, -7, -1.5, -2.5f, false, "béta %20=x/y",
        Array[Byte](-1, 0, 127),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        java.sql.Date.valueOf("1969-12-31")))
    GraftStore.register("dsk_types", schema, rows, shardKey = Some("id"),
      numSegments = 2, payloadDir = Some(dir))
    diskSegments("dsk_types").foreach(s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows]))
    val back = read("dsk_types").orderBy("id").collect()
    assert(back.length == 3)
    rows.sortBy(_.getLong(0)).zip(back).foreach { case (want, got) =>
      (0 until schema.length).foreach { i =>
        (want.get(i), got.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq == b.toSeq)
          case (a, b) => assert(a == b, s"col ${schema(i).name}: $a != $b")
        }
      }
    }
  }

  test("SQL: CREATE TABLE TBLPROPERTIES('payload'='disk') is disk-backed from birth") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.lake")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.disk_t")
    spark.sql("""CREATE TABLE graft_cat.lake.disk_t (id BIGINT, v STRING)
                |PARTITIONED BY (id) TBLPROPERTIES ('payload'='disk')""".stripMargin)
    spark.sql("INSERT INTO graft_cat.lake.disk_t SELECT id, cast(id AS string) FROM range(500)")
    // every INSERTed segment landed as parquet, and SQL sees exact rows
    diskSegments("lake.disk_t").foreach(s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows],
        "a payload=disk table must spill INSERTs to parquet"))
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.disk_t").head().getLong(0) == 500)
    GraftStore.resetCounters()
    assert(spark.sql(
      "SELECT count(*) FROM graft_cat.lake.disk_t WHERE id < 50").head().getLong(0) == 50)
    assert(GraftStore.segmentsSkipped.get() > 0,
      "zone maps must prune disk-backed catalog tables")
    // row-level DML keeps working (and stays on disk)
    spark.sql("DELETE FROM graft_cat.lake.disk_t WHERE id >= 400")
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.disk_t").head().getLong(0) == 400)
    diskSegments("lake.disk_t").foreach(s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows]))
    spark.sql("DROP TABLE graft_cat.lake.disk_t")
  }

  test("mutations are segment-local: untouched disk segments survive by reference") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    GraftStore.loadDisk("dsk_local", docs, "doc_id", 8, dir)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    def payloads() = GraftStore.get("dsk_local").segments.map(_.payload)

    // narrow DELETE: zone maps confine the rewrite to the tail segment(s)
    val before = payloads()
    spark.sql(s"DELETE FROM graft_cat.`dsk_local` WHERE doc_id > ${maxId - 10}")
    val afterDelete = payloads()
    assert(read("dsk_local").count() == docs.where(col("doc_id") <= maxId - 10).count())
    val keptByRef = before.zip(afterDelete).count { case (a, b) => a eq b }
    assert(keptByRef >= 6,
      s"a narrow delete must keep most segments by reference, kept=$keptByRef of 8")
    assert(before.zip(afterDelete).exists { case (a, b) => !(a eq b) },
      "the matching segment must actually be rewritten")

    // 1-row delta UPDATE: exactly one segment file changes
    val preUpdate = payloads()
    spark.sql("UPDATE graft_cat.`dsk_local` SET lang = 'xx' WHERE doc_id = 5")
    val postUpdate = payloads()
    assert(read("dsk_local").where("lang = 'xx'").count() == 1)
    assert(preUpdate.zip(postUpdate).count { case (a, b) => !(a eq b) } == 1,
      "a 1-row update must rewrite exactly one segment")

    // append: every existing segment untouched, one tail segment added
    val preAppend = payloads()
    val epochBefore = GraftStore.orderEpoch("dsk_local")
    docs.limit(7).write.format("graft-store")
      .option("name", "dsk_local").mode("append").save()
    val postAppend = payloads()
    assert(postAppend.size == preAppend.size + 1, "append must add a tail segment")
    preAppend.zip(postAppend).foreach { case (a, b) =>
      assert(a eq b, "append must not touch existing segments")
    }
    assert(GraftStore.orderEpoch("dsk_local") == epochBefore,
      "a tail append preserves row positions - streaming offsets stay valid")
  }

  test("CALL compact: distributed re-layout heals tail-segment fragmentation") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    GraftStore.loadDisk("dsk_frag", docs.where("doc_id < 300"), "doc_id", 4, dir)
    // fragment: five appends = five tail segments overlapping the layout
    (0 until 5).foreach { i =>
      docs.where(s"doc_id >= ${300 + i * 20} AND doc_id < ${320 + i * 20}")
        .write.format("graft-store").option("name", "dsk_frag")
        .mode("append").save()
    }
    val fragmented = GraftStore.get("dsk_frag").segments.size
    assert(fragmented == 9, s"expected 4 + 5 tail segments, got $fragmented")
    val want = docs.where("doc_id < 400").count()

    val out = spark.sql(
      "CALL graft_cat.system.compact(tbl => 'dsk_frag', segments => 4)").collect()
    assert(out.length == 1 && out(0).getInt(0) == 9 && out(0).getInt(1) == 4 &&
      out(0).getLong(2) == want, s"unexpected CALL result: ${out.toSeq}")

    // healed layout: exact rows, disjoint zones prune again, disk-backed
    assert(read("dsk_frag").count() == want)
    assert(read("dsk_frag").except(docs.where("doc_id < 400")).count() == 0)
    diskSegments("dsk_frag").foreach(s =>
      assert(s.payload.isInstanceOf[GraftStore.ParquetRows]))
    GraftStore.resetCounters()
    read("dsk_frag").where(col("doc_id") < 50).count()
    assert(GraftStore.segmentsSkipped.get() >= 2,
      s"compacted layout must prune, skipped=${GraftStore.segmentsSkipped.get()}")
  }

  test("streaming a disk collection: bounded micro-batches, parity with batch") {
    import org.apache.spark.sql.streaming.Trigger
    GraftStore.loadDisk("dsk_stream", docs, "doc_id", 4, dir)
    val ckpt = Files.createTempDirectory("graft_disk_ckpt").toString
    val q = spark.readStream.format("graft-store")
      .option("name", "dsk_stream").option("batchrows", "64").load()
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("dsk_sink")
      .outputMode("complete").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    val got = spark.table("dsk_sink").orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty,
      "streamed disk collection must replay every row exactly once")
  }

  test("clustered disk layout injects the partition-directory key column") {
    // keys that exercise path escaping and a null partition
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val rows = Seq(Row("plain", 1L), Row("with space", 2L),
      Row("a/b=c%d", 3L), Row(null, 4L), Row("plain", 5L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    GraftStore.loadClusteredDisk("dsk_keys", df, "k", dir)
    val back = read("dsk_keys").orderBy("v").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("plain", 1L), ("with space", 2L), ("a/b=c%d", 3L), (null, 4L),
      ("plain", 5L)))
    // one segment per distinct key, including the null bucket
    assert(GraftStore.get("dsk_keys").segments.size == 4)
  }
}
