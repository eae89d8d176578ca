package graft

import java.nio.file.Files

import org.apache.spark.sql.sources.GreaterThanOrEqual
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftStore

/** Store maintenance procedures: `CALL graft_cat.system.vacuum` (expire
  * time-travel generations + reclaim unreferenced payload files) and
  * `CALL graft_cat.system.zorder` (2-D Morton re-clustering). Together
  * with compact/history these are the lakehouse maintenance surface —
  * the operations that keep a mutation-churned collection readable,
  * prunable, and bounded on disk.
  *
  * The vacuum tests pin the two safety properties that make it usable:
  * a retained generation that SHARES segment files with the live
  * collection (segment-local mutations rewrite only touched segments)
  * must keep those files, and only unreferenced generations' files may
  * go. The zorder tests pin the point of the layout: after re-
  * clustering, zone maps prune on BOTH dimensions, and the rows are
  * exactly the ones written. */
class StoreMaintenanceSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    s
  }

  private def read(name: String) =
    spark.read.format("graft-store").option("name", name).load()

  private def filesUnder(d: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(d))
  }

  private def segPaths(c: GraftStore.Collection): Set[String] =
    c.segments.flatMap(_.payload match {
      case GraftStore.ParquetRows(ps, _, _, _) => ps
      case _ => Nil
    }).toSet

  // manifests carry `file:/…` URIs from distributed writes
  private def asFile(p: String): java.io.File =
    if (p.startsWith("file:")) new java.io.File(java.net.URI.create(p).getPath)
    else new java.io.File(p)

  test("vacuum expires history, deletes expired generations' files, keeps the live ones") {
    val dir = Files.createTempDirectory("graft_vac").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    GraftStore.drop("vac_docs")
    GraftStore.loadDisk("vac_docs", docs.where("doc_id < 400"), "doc_id", 4, dir)
    val genOnePaths = segPaths(GraftStore.get("vac_docs"))
    // two segment-local deletes → two more generations sharing untouched files
    GraftStore.deleteWhere("vac_docs", Array(GreaterThanOrEqual("doc_id", 300L)))
    GraftStore.deleteWhere("vac_docs", Array(GreaterThanOrEqual("doc_id", 200L)))
    assert(GraftStore.versionHistory("vac_docs").size == 3)
    val expect = read("vac_docs").count()
    val before = filesUnder(dir).size

    val out = spark.sql(
      "CALL graft_cat.system.vacuum(tbl => 'vac_docs', keep_last => 1)").head()
    assert(out.getInt(0) == 2, s"3 generations - 1 kept = 2 expired, got ${out.getInt(0)}")
    assert(out.getInt(1) > 0 && out.getLong(2) > 0L,
      "expired generations held real files and bytes")
    assert(out.getInt(3) == 1)

    // live data intact, byte for byte reachable
    assert(read("vac_docs").count() == expect)
    assert(read("vac_docs").where("doc_id >= 200").count() == 0)
    // expired time travel is a loud error now
    val gone = intercept[NoSuchElementException](GraftStore.getVersion("vac_docs", 1))
    assert(gone.getMessage.contains("retained"))
    // every LIVE segment file still exists; file count shrank
    segPaths(GraftStore.get("vac_docs")).foreach { p =>
      assert(asFile(p).exists(), s"live payload deleted: $p")
    }
    assert(filesUnder(dir).size < before)
    // at least one generation-1-only file is gone
    val liveNow = segPaths(GraftStore.get("vac_docs"))
    assert((genOnePaths -- liveNow).exists(p => !asFile(p).exists()),
      "expired generation's replaced segment files must be reclaimed")
    GraftStore.drop("vac_docs")
  }

  test("vacuum never deletes files shared between the live and a retained generation") {
    val dir = Files.createTempDirectory("graft_vac2").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    GraftStore.drop("vac2_docs")
    GraftStore.loadDisk("vac2_docs", docs.where("doc_id < 400"), "doc_id", 4, dir)
    GraftStore.deleteWhere("vac2_docs", Array(GreaterThanOrEqual("doc_id", 300L)))
    GraftStore.deleteWhere("vac2_docs", Array(GreaterThanOrEqual("doc_id", 200L)))
    val v2 = GraftStore.getVersion("vac2_docs", 2)
    val v3 = GraftStore.get("vac2_docs")
    val shared = segPaths(v2).intersect(segPaths(v3))
    assert(shared.nonEmpty,
      "segment-local delete must leave untouched segments shared across generations " +
        "(otherwise this test pins nothing)")

    spark.sql("CALL graft_cat.system.vacuum(tbl => 'vac2_docs', keep_last => 2)").collect()
    // BOTH generations still fully readable — shared files survived
    assert(read("vac2_docs").count() == v3.rowCount)
    assert(read("vac2_docs@v2").count() == v2.rowCount)
    shared.foreach(p => assert(asFile(p).exists(), s"shared payload deleted: $p"))
    // generation 1 (expired) is gone from history
    intercept[NoSuchElementException](GraftStore.getVersion("vac2_docs", 1))
    GraftStore.drop("vac2_docs")
  }

  test("zorder re-clusters a disk collection: zone maps prune BOTH dimensions, rows exact") {
    val dir = Files.createTempDirectory("graft_zo").toString
    // b decorrelated from a: a range shard on a leaves every segment
    // spanning ~the full b range, so b predicates can prune nothing
    val df = spark.range(10000).selectExpr(
      "id AS a", "(id * 7919) % 10000 AS b", "cast(id AS string) AS s")
    GraftStore.drop("zo_t")
    GraftStore.loadDisk("zo_t", df, "a", 8, dir)

    def bWindow() = read("zo_t").where("b BETWEEN 100 AND 199")
      .selectExpr("a", "b", "s").collect().map(_.toSeq).sortBy(_.toString)
    val wantRows = bWindow()
    GraftStore.resetCounters()
    bWindow()
    assert(GraftStore.segmentsSkipped.get() == 0,
      "before z-order, b spans every range shard — nothing can prune")

    val out = spark.sql(
      "CALL graft_cat.system.zorder(tbl => 'zo_t', x => 'a', y => 'b')").head()
    assert(out.getInt(0) == 8 && out.getInt(1) == 8 && out.getLong(2) == 10000L)
    assert(GraftStore.get("zo_t").rowCount == 10000L)
    assert(GraftStore.props("zo_t").get("layout").contains("zorder(a, b)"))

    // identical rows, now prunable in y …
    GraftStore.resetCounters()
    assert(bWindow().toSeq == wantRows.toSeq)
    assert(GraftStore.segmentsSkipped.get() > 0,
      s"z-order must make b-zone maps selective, skipped=${GraftStore.segmentsSkipped.get()}")
    // … and still prunable in x
    GraftStore.resetCounters()
    assert(read("zo_t").where("a BETWEEN 0 AND 99").count() == 100L)
    assert(GraftStore.segmentsSkipped.get() > 0,
      s"x-zone maps must stay selective after z-order, skipped=${GraftStore.segmentsSkipped.get()}")
    GraftStore.drop("zo_t")
  }

  test("zorder on an in-memory collection: same rows, pruning recovered") {
    val df = spark.range(4096).selectExpr("id AS a", "(id * 31) % 4096 AS b")
    GraftStore.drop("zo_mem")
    GraftStore.load("zo_mem", df, shardKey = Some("a"), numSegments = 8)
    val want = read("zo_mem").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val (before, after) = GraftStore.zorder("zo_mem", spark, "a", "b")
    assert(before == 8 && after == 8)
    assert(read("zo_mem").collect().map(_.toSeq).sortBy(_.toString).toSeq == want)
    GraftStore.resetCounters()
    read("zo_mem").where("b BETWEEN 0 AND 63").count()
    assert(GraftStore.segmentsSkipped.get() > 0)
    GraftStore.drop("zo_mem")
  }

  test("CALL system.detail: per-segment rows/files/bytes/zones/blooms evidence") {
    val dir = Files.createTempDirectory("graft_det").toString
    GraftStore.drop("det_t")
    val df = spark.range(1000).selectExpr("id AS a", "md5(cast(id AS string)) AS k")
    GraftStore.loadDisk("det_t", df, "a", 4, dir, bloomCols = Map("k" -> 500L))
    val rows = spark.sql("CALL graft_cat.system.detail(tbl => 'det_t')").collect()
    assert(rows.length == GraftStore.get("det_t").segments.size)
    assert(rows.map(_.getLong(1)).sum == 1000L, "per-segment rows must total the table")
    rows.foreach { r =>
      assert(r.getString(2) == "parquet" && r.getInt(3) >= 1 && r.getLong(4) > 0L,
        s"disk segment must report real files and bytes: $r")
      assert(r.getLong(5) > 0L, s"manifest bytes must be priced: $r")
      assert(r.getString(6).contains("a:["), s"zone span for the shard key: $r")
      assert(r.getString(7) == "k", s"bloom column listed: $r")
    }
    GraftStore.drop("det_t")
  }

  test("vacuum rejects nonsense loudly: keep_last < 1, snapshots, unknown collections") {
    intercept[IllegalArgumentException](GraftStore.vacuum("whatever", 0))
    intercept[UnsupportedOperationException](GraftStore.vacuum("x@v3", 1))
    intercept[NoSuchElementException](GraftStore.vacuum("no_such_collection_zzz", 1))
  }
}
