package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftStore

/** Direct parquet→vector decode (GraftColumnar): disk segments decode
  * pages straight into OnHeapColumnVectors — no Group, no external Row.
  * These tests pin the path's three contracts: (1) value parity with
  * the row path across every payload type including nulls; (2)
  * vectorized filter parity with `GraftStore.eval` (same three-valued
  * null semantics, same UTF-8-binary string order) under randomized
  * data; (3) the synthesized `_segment`/`_pos` metadata columns and
  * clustered constants survive the columnar shape. */
class ColumnarScanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def read(name: String) =
    spark.read.format("graft-store").option("name", name).load()

  private lazy val dir = Files.createTempDirectory("graft_columnar").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("ts", TimestampType),
    StructField("dt", DateType)))

  // deterministic mixed data with nulls in every column and
  // supplementary-plane strings (the UTF-8-order regression shape)
  private def mkRows(n: Int): Seq[Row] = (0 until n).map { k =>
    def maybe[A](v: A): Any = if (k % 7 == 3) null else v
    Row(k.toLong, maybe(k * 31 % 101), maybe(k * 0.75 - 10),
      maybe(k * 0.5f), maybe(k % 2 == 0),
      maybe(if (k % 11 == 5) s"emoji-😀-$k" else s"s-${k % 13}-$k"),
      maybe(Array[Byte]((k % 127).toByte, (-k % 127).toByte)),
      maybe(new java.sql.Timestamp(1700000000000L + k * 1234567L)),
      maybe(java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(k % 900))))
  }

  test("columnar disk scan: value parity with the in-memory row path, all types") {
    val rows = mkRows(800)
    GraftStore.register("col_t", schema, rows, shardKey = Some("id"),
      numSegments = 4, payloadDir = Some(dir))
    GraftStore.register("col_mem", schema, rows, shardKey = Some("id"), numSegments = 4)
    val plan = read("col_t").queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"disk scan must take the columnar path:\n$plan")
    val (dsk, mem) = (read("col_t"), read("col_mem"))
    assert(dsk.count() == 800 && mem.count() == 800)
    assert(dsk.except(mem).count() == 0 && mem.except(dsk).count() == 0)
  }

  test("vectorized filter parity with GraftStore.eval on randomized predicates") {
    val rows = mkRows(800)
    GraftStore.register("col_f", schema, rows, shardKey = Some("id"),
      numSegments = 4, payloadDir = Some(dir))
    GraftStore.register("col_f_mem", schema, rows, shardKey = Some("id"), numSegments = 4)
    val preds = Seq(
      col("i") > 40 && col("d") <= 50.0,
      col("s") === "emoji-😀-5",
      col("s") >= "s-9", // UTF-8 order over the emoji strings too
      col("b") === true && col("f") < 100f,
      col("i").isNull,
      col("s").isNotNull && col("id") =!= 13L,
      col("ts") > lit(new java.sql.Timestamp(1700500000000L)),
      col("dt") <= lit(java.sql.Date.valueOf("2021-06-01")),
      col("s").isin("s-1-14", "s-2-15", "emoji-😀-16", "nope"))
    preds.foreach { p =>
      val got = read("col_f").where(p).select("id").collect().map(_.getLong(0)).toSet
      val want = read("col_f_mem").where(p).select("id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"predicate $p: ${got.diff(want)} vs ${want.diff(got)}")
    }
  }

  test("_segment and _pos ride the columnar path; positions are pre-filter") {
    val rows = mkRows(400)
    GraftStore.register("col_pos", schema, rows, shardKey = Some("id"),
      numSegments = 4, payloadDir = Some(dir))
    val all = read("col_pos").select(col("_pos"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // rows are shard-sorted by id, so _pos follows id order exactly
    assert(all.map(_._1).toSeq == (0L until 400L))
    assert(all.map(_._2).toSeq == (0L until 400L))
    assert(read("col_pos").select("_segment").distinct().count() == 4)
    // positions identify rows in COLLECTION order even under filters
    val filtered = read("col_pos").where(col("id") >= 100L && col("id") < 110L)
      .select("_pos").collect().map(_.getLong(0)).sorted.toSeq
    assert(filtered == (100L until 110L))
  }

  test("clustered disk layout: the constant key column decodes columnar too") {
    import spark.implicits._
    val df = (1 to 300).map(k => (k.toLong, s"g${k % 5}", k * 1.0)).toDF("id", "grp", "v")
    GraftStore.loadClusteredDisk("col_clu", df, "grp", dir)
    val got = read("col_clu").groupBy("grp").agg(count(lit(1)).as("n"),
      sum("v").cast("long").as("sv"))
    val want = df.groupBy("grp").agg(count(lit(1)).as("n"),
      sum("v").cast("long").as("sv"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // constants-only projection: the parquet files carry NO requested
    // column at all — row multiplicity must still be exact
    val grpOnly = read("col_clu").select("grp").collect().map(_.getString(0))
    assert(grpOnly.length == 300 && grpOnly.groupBy(identity).forall(_._2.length == 60))
  }
}
