package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftStore

/** Bloom-filter segment skipping: point lookups (`=`, `IN`) on columns
  * the LAYOUT is not organized by. A range shard or z-order makes
  * min/max zones selective in its own dimensions only — equality on a
  * high-cardinality column decorrelated from the layout (a content
  * hash, a fingerprint, a foreign id) scans every segment without
  * this. The store writes parquet-native Bloom filters per the table's
  * `bloom.columns` spec and consults them at planning; parquet's
  * no-false-negative contract makes a skip always safe.
  *
  * Determinism note: bloom false positives are a deterministic
  * function of the written data, not run-to-run randomness — the skip
  * counts asserted here are stable, with one-segment slack for the
  * format's ~1% FPP. */
class BloomSkipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def read(name: String) =
    spark.read.format("graft-store").option("name", name).load()

  // md5 hex: high-cardinality, uniformly spread — every segment's zone
  // span covers any probe, so zones alone can never skip
  private def hashed(n: Int) = spark.range(n).selectExpr(
    "id", "md5(cast(id AS string)) AS k")

  test("equality on a non-layout column: blooms skip what zones cannot") {
    val dir = Files.createTempDirectory("graft_bloom").toString
    GraftStore.drop("bl_t")
    GraftStore.loadDisk("bl_t", hashed(8192), "id", 8, dir,
      bloomCols = Map("k" -> 1500L))

    val probe = hashed(8192).where("id = 4321").head().getString(1)
    // zones are powerless here: every segment's (min, max) admits the probe
    GraftStore.get("bl_t").segments.foreach { s =>
      val (lo, hi) = s.zones("k")
      assert(probe >= lo.asInstanceOf[String] && probe <= hi.asInstanceOf[String])
    }
    GraftStore.resetCounters()
    val got = read("bl_t").where(s"k = '$probe'").collect()
    assert(got.length == 1 && got(0).getLong(0) == 4321L)
    assert(GraftStore.segmentsSkipped.get() >= 5,
      s"the probe lives in ONE segment; skipped=${GraftStore.segmentsSkipped.get()}")

    // a miss skips everything (no segment read at all, bar FPP slack)
    GraftStore.resetCounters()
    assert(read("bl_t").where("k = 'not-a-hash-of-anything'").count() == 0L)
    assert(GraftStore.segmentsSkipped.get() >= 6)

    // IN over two probes: union of two single-segment hits
    val probe2 = hashed(8192).where("id = 77").head().getString(1)
    GraftStore.resetCounters()
    assert(read("bl_t").where(s"k IN ('$probe', '$probe2')").count() == 2L)
    assert(GraftStore.segmentsSkipped.get() >= 4)
    GraftStore.drop("bl_t")
  }

  test("blooms survive compaction and segment-local mutation (props carry the spec)") {
    val dir = Files.createTempDirectory("graft_bloom2").toString
    GraftStore.drop("bl_m")
    GraftStore.loadDisk("bl_m", hashed(8192), "id", 8, dir,
      bloomCols = Map("k" -> 1500L))
    val probe = hashed(8192).where("id = 1234").head().getString(1)

    GraftStore.compact("bl_m", spark, 4)
    assert(GraftStore.get("bl_m").segments.forall(_.blooms.contains("k")),
      "compaction must regenerate blooms from the table spec")
    GraftStore.resetCounters()
    assert(read("bl_m").where(s"k = '$probe'").count() == 1L)
    assert(GraftStore.segmentsSkipped.get() >= 2,
      s"4 segments, one hit; skipped=${GraftStore.segmentsSkipped.get()}")

    // a segment-local DELETE rewrite keeps blooms on the rewritten segment
    GraftStore.deleteWhere("bl_m",
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 8000L)))
    assert(GraftStore.get("bl_m").segments.filter(_.count > 0)
      .forall(_.blooms.contains("k")))
    assert(read("bl_m").count() == 8000L)
    GraftStore.resetCounters()
    assert(read("bl_m").where(s"k = '$probe'").count() == 1L)
    assert(GraftStore.segmentsSkipped.get() >= 2)
    GraftStore.drop("bl_m")
  }

  test("memory payload parity: bloom.columns prunes in-memory tables identically") {
    val s = spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.lake")
    s.sql("DROP TABLE IF EXISTS graft_cat.lake.blm")
    // NO payload=disk: rows stay driver-side MemRows; blooms must be
    // built from the values at registration, same spec, same pruning
    s.sql("""CREATE TABLE graft_cat.lake.blm (id BIGINT, k STRING)
            |PARTITIONED BY (id)
            |TBLPROPERTIES ('bloom.columns' = 'k:1500')""".stripMargin)
    s.sql("INSERT INTO graft_cat.lake.blm SELECT id, md5(cast(id AS string)) FROM range(8192)")
    val segs = GraftStore.get("lake.blm").segments.filter(_.count > 0)
    assert(segs.forall(_.payload.isInstanceOf[GraftStore.MemRows]),
      "this test must exercise the MEMORY payload path")
    assert(segs.forall(_.blooms.contains("k")))
    val probe = s.sql("SELECT md5(cast(4321 AS string))").head().getString(0)
    GraftStore.resetCounters()
    assert(s.sql(s"SELECT count(*) FROM graft_cat.lake.blm WHERE k = '$probe'")
      .head().getLong(0) == 1L)
    assert(GraftStore.segmentsSkipped.get() >= 5,
      s"skipped=${GraftStore.segmentsSkipped.get()}")
    // miss probe: everything skipped (memory path is exactly sized)
    GraftStore.resetCounters()
    assert(s.sql("SELECT count(*) FROM graft_cat.lake.blm WHERE k = 'nope'")
      .head().getLong(0) == 0L)
    assert(GraftStore.segmentsSkipped.get() >= 6)
    s.sql("DROP TABLE graft_cat.lake.blm")
  }

  test("bloom.mode=lazy: nothing resident in the manifest, probes load through the capped LRU") {
    val dir = Files.createTempDirectory("graft_bloom_lazy").toString
    GraftStore.drop("bl_lazy")
    GraftStore.setProps("bl_lazy", Map("bloom.mode" -> "lazy"))
    GraftStore.loadDisk("bl_lazy", hashed(8192), "id", 8, dir,
      bloomCols = Map("k" -> 1500L))
    // the manifest pins zero bloom bytes: size model says so per segment
    val segs = GraftStore.get("bl_lazy").segments.filter(_.count > 0)
    assert(segs.forall(_.blooms.contains("k")))
    assert(segs.forall(_.blooms("k").residentBytes == 0L),
      "lazy blooms must not pin bitsets in the manifest")
    GraftStore.BloomCache.clear()
    val probe = hashed(8192).where("id = 4321").head().getString(1)
    GraftStore.resetCounters()
    val got = read("bl_lazy").where(s"k = '$probe'").collect()
    assert(got.length == 1 && got(0).getLong(0) == 4321L)
    assert(GraftStore.segmentsSkipped.get() >= 5,
      s"lazy blooms must skip like eager ones; skipped=${GraftStore.segmentsSkipped.get()}")
    assert(GraftStore.BloomCache.misses.get() > 0)
    // second probe: footers are NOT re-read (cache hits), answers agree
    val (m0, h0) = (GraftStore.BloomCache.misses.get(), GraftStore.BloomCache.hits.get())
    assert(read("bl_lazy").where(s"k = '$probe'").count() == 1L)
    assert(GraftStore.BloomCache.misses.get() == m0 &&
      GraftStore.BloomCache.hits.get() > h0)
    // a starvation-level cap still answers correctly (reload per miss),
    // and resident bytes stay bounded by the cap's order
    sys.props("graft.store.bloom.cache.bytes") = "1024"
    try {
      GraftStore.BloomCache.clear()
      assert(read("bl_lazy").where(s"k = '$probe'").count() == 1L)
      assert(read("bl_lazy").where("k = 'not-a-hash'").count() == 0L)
      assert(GraftStore.BloomCache.residentBytes <= 16 * 1024,
        s"capped cache must evict; resident=${GraftStore.BloomCache.residentBytes}")
    } finally sys.props.remove("graft.store.bloom.cache.bytes")
  }

  test("CALL system.detail reports the manifest size model per segment") {
    val s = spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.lake")
    s.sql("DROP TABLE IF EXISTS graft_cat.lake.mfb")
    s.sql("""CREATE TABLE graft_cat.lake.mfb (id BIGINT, k STRING)
            |PARTITIONED BY (id)
            |TBLPROPERTIES ('payload' = 'disk', 'bloom.columns' = 'k:1500')""".stripMargin)
    s.sql("INSERT INTO graft_cat.lake.mfb SELECT id, md5(cast(id AS string)) FROM range(8192)")
    val rows = s.sql("CALL graft_cat.system.detail(tbl => 'lake.mfb')").collect()
    val mb = rows.map(r => r.getAs[Long]("manifest_bytes"))
    assert(mb.forall(_ > 0L))
    // eager blooms dominate the entry: the per-segment manifest must
    // account kilobytes (bitsets), not just the path+zone skeleton —
    // and stay FAR below the data bytes it describes
    val dataB = rows.map(r => r.getAs[Long]("bytes"))
    assert(mb.sum > 8 * 1024, s"bloom bitsets must be accounted: ${mb.toSeq}")
    assert(mb.sum < dataB.sum / 4,
      s"manifest (${mb.sum}) must be far smaller than data (${dataB.sum})")
    s.sql("DROP TABLE graft_cat.lake.mfb")
  }

  test("SQL surface: TBLPROPERTIES bloom.columns on a disk table skips on point lookups") {
    val s = spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.lake")
    s.sql("DROP TABLE IF EXISTS graft_cat.lake.bl")
    s.sql("""CREATE TABLE graft_cat.lake.bl (id BIGINT, k STRING)
            |PARTITIONED BY (id)
            |TBLPROPERTIES ('payload' = 'disk', 'bloom.columns' = 'k:1500')""".stripMargin)
    s.sql("INSERT INTO graft_cat.lake.bl SELECT id, md5(cast(id AS string)) FROM range(8192)")
    assert(GraftStore.get("lake.bl").segments.filter(_.count > 0)
      .forall(_.blooms.contains("k")),
      "the INSERT's spilled segments must carry blooms from TBLPROPERTIES")
    val probe = s.sql("SELECT md5(cast(4321 AS string))").head().getString(0)
    GraftStore.resetCounters()
    assert(s.sql(s"SELECT count(*) FROM graft_cat.lake.bl WHERE k = '$probe'")
      .head().getLong(0) == 1L)
    assert(GraftStore.segmentsSkipped.get() > 0,
      s"skipped=${GraftStore.segmentsSkipped.get()}")
    s.sql("DROP TABLE graft_cat.lake.bl")
  }
}
