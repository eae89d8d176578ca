package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

/** Z-order layout: Morton-code bit identity and the min/max-stats
  * tightness that makes multi-dimensional file skipping work. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("mortonE matches a reference interleave bit for bit") {
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val probes = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65535L, 0L), (1L, 65534L))
    val got = spark.createDataFrame(probes).toDF("x", "y")
      .selectExpr("x", "y", s"${Layout.mortonE("x", "y")} AS z")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == ref(x, y), s"($x,$y)") }
  }

  /** Mean per-file extent of a dimension, as a fraction of its global
    * extent — the quantity parquet min/max pruning divides by. */
  private def spread(path: String, dimE: String): Double = {
    val df = spark.read.parquet(path)
      .select(expr(dimE).as("d"), input_file_name().as("f"))
    val per = df.groupBy("f").agg((max("d") - min("d")).cast("double").as("ext"))
      .agg(avg("ext")).head().getDouble(0)
    val glob = df.agg((max("d") - min("d")).cast("double")).head().getDouble(0)
    per / glob
  }

  test("z-ordered files are tight in BOTH dimensions; a linear sort is tight in one") {
    val ev = Tables.events(spark, sf)
    val dir = Files.createTempDirectory("graft_layout").toString
    val zPath = s"$dir/z"
    val linPath = s"$dir/lin"

    Layout.zorderWrite(ev, Layout.userQ, Layout.valueQ, zPath, nFiles = 8)
    // the one-dimensional alternative: same file count, sorted by user
    ev.repartitionByRange(8, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linPath)

    assert(spark.read.parquet(zPath).count() == ev.count())

    val zUser = spread(zPath, Layout.userQ)
    val zVal = spread(zPath, Layout.clampE(Layout.valueQ))
    val linUser = spread(linPath, Layout.userQ)
    val linVal = spread(linPath, Layout.clampE(Layout.valueQ))

    // linear layout: near-perfect on its sort key, useless on the other
    assert(linUser < 0.35, s"linear layout should be tight on user_id, got $linUser")
    assert(linVal > 0.6, s"linear layout should be wide on value, got $linVal")
    // z-order: materially tighter than global extent in BOTH dimensions
    assert(zUser < 0.6 && zVal < 0.6,
      s"z-order should shrink per-file extent in both dims, got user=$zUser value=$zVal")
    assert(zVal < linVal * 0.7,
      s"z-order must beat linear on the non-sort dimension: $zVal vs $linVal")
  }
}
