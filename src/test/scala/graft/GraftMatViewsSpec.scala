package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftMatViews, GraftStore}
import graft.sources.v2.GraftMatViews.{MinMax, SumCount}

/** Materialized views with automatic incremental maintenance: the
  * refresh path choice (noop / append / diff / recompute) and, for
  * every path, exact equality with a from-scratch re-aggregation of
  * the live base. The append path additionally proves it read ONLY the
  * appended rows (feedRows bound). */
class GraftMatViewsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def read(name: String) =
    spark.read.format("graft-store").option("name", name).load()

  private def recompute(base: String, kind: GraftMatViews.MvKind) = kind match {
    case SumCount => read(base).groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("v"))
    case MinMax => read(base).groupBy("lang")
      .agg(count(lit(1)).as("n"), min("n_chars").as("mn"), max("n_chars").as("mx"))
  }

  private def assertStateMatches(mv: String, base: String,
      kind: GraftMatViews.MvKind): Unit = {
    val got = GraftMatViews.read(spark, mv)
    val want = recompute(base, kind)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"MV $mv diverged from recompute")
  }

  private def freshDocs(n: Int, idFrom: Int = 0) =
    (idFrom until idFrom + n).map(i =>
      (i.toLong, s"lang${i % 3}", (100 + i * 7 % 400).toLong))
      .toDF("doc_id", "lang", "n_chars")

  test("append-only refresh reads only the new segments (disk-backed base)") {
    val dir = Files.createTempDirectory("mv_disk").toString
    GraftStore.loadDisk("mv_base_a", freshDocs(300), "doc_id", 4, dir)
    GraftMatViews.create(spark, "mv_sum_a", "mv_base_a", "doc_id", "lang", "n_chars")
    assertStateMatches("mv_sum_a", "mv_base_a", SumCount)

    // pure append: 40 rows land as a tail segment
    GraftStore.append("mv_base_a",
      read("mv_base_a").schema, freshDocs(40, idFrom = 1000).collect().toSeq)
    val r = GraftMatViews.refresh(spark, "mv_sum_a")
    assert(r.mode == "append", s"expected append path, got ${r.mode}")
    assert(r.feedRows == 40L, s"append feed must be exactly the new rows, got ${r.feedRows}")
    assertStateMatches("mv_sum_a", "mv_base_a", SumCount)

    // no changes -> noop, zero reads
    val r2 = GraftMatViews.refresh(spark, "mv_sum_a")
    assert(r2 == GraftMatViews.RefreshResult("noop", 0L))
  }

  test("history rewrite falls back to the snapshot-diff path and stays exact") {
    GraftStore.load("mv_base_b", freshDocs(200), shardKey = Some("doc_id"), numSegments = 4)
    GraftMatViews.create(spark, "mv_sum_b", "mv_base_b", "doc_id", "lang", "n_chars")

    // full rewrite: 30 docs change lang (group moves), 20 deleted, 25 inserted
    val next = freshDocs(200).where("doc_id >= 20")
      .selectExpr("doc_id",
        "CASE WHEN doc_id % 7 = 0 THEN 'langX' ELSE lang END AS lang", "n_chars")
      .unionByName(freshDocs(25, idFrom = 500))
    GraftStore.register("mv_base_b", next.schema, next.collect().toSeq,
      shardKey = Some("doc_id"), numSegments = 4)

    val r = GraftMatViews.refresh(spark, "mv_sum_b")
    assert(r.mode == "diff", s"expected diff path, got ${r.mode}")
    assert(r.feedRows > 0)
    assertStateMatches("mv_sum_b", "mv_base_b", SumCount)
  }

  test("MIN/MAX view survives an extremum deletion via the dirty-group recompute") {
    GraftStore.load("mv_base_c", freshDocs(150), shardKey = Some("doc_id"), numSegments = 4)
    GraftMatViews.create(spark, "mv_mm_c", "mv_base_c", "doc_id", "lang", "n_chars",
      kind = MinMax)
    assertStateMatches("mv_mm_c", "mv_base_c", MinMax)

    // delete exactly each lang's current max row — the non-maintainable case
    val maxIds = read("mv_base_c")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .where("rk = 1").select("doc_id").as[Long].collect().toSet
    val next = read("mv_base_c").where(!col("doc_id").isInCollection(maxIds))
    GraftStore.register("mv_base_c", next.schema, next.collect().toSeq,
      shardKey = Some("doc_id"), numSegments = 4)

    val r = GraftMatViews.refresh(spark, "mv_mm_c")
    assert(r.mode == "diff")
    assertStateMatches("mv_mm_c", "mv_base_c", MinMax)
  }

  test("a high-cardinality group key keeps MV state off the driver (distributed write)") {
    val propKey = "graft.matviews.collect.max.rows"
    val prev = sys.props.get(propKey)
    sys.props(propKey) = "50" // force the loadDisk path at toy scale
    try {
      val dir = Files.createTempDirectory("mv_disk_hc").toString
      // group = doc_id: 300 groups, 6x past the ceiling — at real scale
      // this is the user_id/url-grouped view a driver collect would OOM on
      GraftStore.loadDisk("mv_base_hc", freshDocs(300), "doc_id", 4, dir)
      GraftMatViews.create(spark, "mv_sum_hc", "mv_base_hc",
        "doc_id", "doc_id", "n_chars")
      def diskBacked() = GraftStore.get("mv_sum_hc").segments
        .forall(_.payload.isInstanceOf[GraftStore.ParquetRows])
      assert(diskBacked(), "create must write state through loadDisk, not a driver collect")

      GraftStore.append("mv_base_hc", read("mv_base_hc").schema,
        freshDocs(60, idFrom = 1000).collect().toSeq)
      val r = GraftMatViews.refresh(spark, "mv_sum_hc")
      assert(r.mode == "append" && r.feedRows == 60L, s"got $r")
      assert(diskBacked(), "refresh must keep state disk-backed")
      val got = GraftMatViews.read(spark, "mv_sum_hc")
      val want = read("mv_base_hc").groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("v"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "distributed state diverged from recompute")
    } finally prev match {
      case Some(v) => sys.props(propKey) = v
      case None => sys.props.remove(propKey)
    }
  }

  test("refresh pins the version its feed covers, atomically with the feed") {
    val dirE = Files.createTempDirectory("mv_disk_e").toString
    GraftStore.loadDisk("mv_base_e", freshDocs(100), "doc_id", 2, dirE)
    GraftMatViews.create(spark, "mv_sum_e", "mv_base_e", "doc_id", "lang", "n_chars")
    val v0 = GraftStore.currentVersion("mv_base_e")
    GraftStore.append("mv_base_e", read("mv_base_e").schema,
      freshDocs(10, idFrom = 3000).collect().toSeq)
    // the atomic capture: segments and the version they bring us to,
    // from one critical section — the pair the refresh pins
    val (segs, v1) = GraftStore.appendedSinceWithVersion("mv_base_e", v0)
    assert(v1 == v0 + 1 && segs.exists(_.map(_.count).sum == 10L))
    val r = GraftMatViews.refresh(spark, "mv_sum_e")
    assert(r.mode == "append")
    // after refresh the registry pin equals the covered version: a
    // second refresh is a NOOP (nothing replayed, nothing double-counted)
    assert(GraftMatViews.definition("mv_sum_e").exists(_.baseVersion == v1))
    assert(GraftMatViews.refresh(spark, "mv_sum_e") ==
      GraftMatViews.RefreshResult("noop", 0L))
    assertStateMatches("mv_sum_e", "mv_base_e", SumCount)
  }

  test("a base version evicted from retention forces a full recompute") {
    GraftStore.load("mv_base_d", freshDocs(50), shardKey = Some("doc_id"), numSegments = 2)
    GraftMatViews.create(spark, "mv_sum_d", "mv_base_d", "doc_id", "lang", "n_chars")
    // churn past the 16-generation retention ring
    (0 until 20).foreach { i =>
      GraftStore.append("mv_base_d",
        read("mv_base_d").schema, freshDocs(1, idFrom = 2000 + i).collect().toSeq)
    }
    val r = GraftMatViews.refresh(spark, "mv_sum_d")
    // appendedSince can no longer see the pinned version -> not append;
    // snapshotDiff can't either -> recompute
    assert(r.mode == "recompute", s"expected recompute, got ${r.mode}")
    assertStateMatches("mv_sum_d", "mv_base_d", SumCount)
  }

  test("a live stream keeps the MV fresh via the append fast path across a restart") {
    import java.nio.file.{Paths, StandardCopyOption}
    import org.apache.spark.sql.DataFrame
    val stage = Files.createTempDirectory("mv_src").toString
    val ckpt = Files.createTempDirectory("mv_ckpt").toString
    // disk-backed: the streaming base shape — appends land as tail
    // segments by reference (an in-memory SHARDED collection re-shards
    // on append, which rewrites history and honestly forces the diff
    // path; a stream would never sit on one)
    val baseDir = Files.createTempDirectory("mv_disk_s").toString
    GraftStore.loadDisk("mv_base_s", freshDocs(120), "doc_id", 3, baseDir)
    GraftMatViews.create(spark, "mv_sum_s", "mv_base_s", "doc_id", "lang", "n_chars")
    val modes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def addFile(name: String, from: Int, n: Int): Unit = {
      val tmp = Files.createTempDirectory("mv_tmp").toString
      freshDocs(n, idFrom = from).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(stage, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, lang STRING, n_chars LONG")
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          GraftStore.append("mv_base_s", batch.schema, batch.collect().toSeq)
          val r = GraftMatViews.refresh(spark, "mv_sum_s")
          modes += ((r.mode, r.feedRows)); ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    addFile("a.parquet", 1000, 30); addFile("b.parquet", 2000, 25)
    run()                       // two micro-batches, then the crash point
    addFile("c.parquet", 3000, 40)
    run()                       // fresh query off the SAME checkpoint —
                                // committed batches are NOT replayed
    assert(modes.map(_._1).forall(_ == "append"),
      s"every streamed refresh must take the append path: $modes")
    assert(modes.map(_._2).sum == 95L,
      s"append feeds must cover exactly the streamed rows: $modes")
    assertStateMatches("mv_sum_s", "mv_base_s", SumCount)
  }

  test("the MV is SQL-visible through the catalog like any collection") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    GraftStore.load("mv_base_e", freshDocs(60), shardKey = Some("doc_id"), numSegments = 2)
    GraftMatViews.create(spark, "mv_sum_e", "mv_base_e", "doc_id", "lang", "n_chars")
    val viaSql = spark.sql("SELECT lang, n, v FROM graft_cat.`mv_sum_e` ORDER BY lang")
    val direct = GraftMatViews.read(spark, "mv_sum_e").orderBy("lang")
    assert(viaSql.collect().toSeq == direct.select("lang", "n", "v").collect().toSeq)
  }
}
