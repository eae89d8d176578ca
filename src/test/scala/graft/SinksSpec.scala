package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"

  test("partitioned write enables partition pruning on read") {
    val path = Files.createTempDirectory("part_out").toString + "/orders"
    val o = Tables.orders(spark, sf)
      .withColumn("status", col("o_orderstatus"))
    Sinks.writePartitioned(o, path, Seq("status"))
    val read = spark.read.parquet(path).where("status = 'F'")
    assert(read.count() == Tables.orders(spark, sf).where("o_orderstatus = 'F'").count())
    // pruning visible in the scan: only the matching partition directory
    val scanStr = read.queryExecution.executedPlan.toString
    assert(!scanStr.contains("status=O"), "pruned partitions must not be scanned")
  }

  test("bucketed tables join WITHOUT a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Sinks.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_custkey", 8)
    Sinks.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Sinks.table(spark, "orders_b")
        .join(Sinks.table(spark, "customer_b"), "o_custkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      assert(j.count() == o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("compaction shrinks the file count, preserves every row, swaps atomically") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.repartition(32).write.parquet(dir) // the small-file mess
    val want = docs.count()
    val (before, after) = Sinks.compactSmallFiles(spark, dir, targetBytes = 1L << 20)
    assert(before == 32 && after < before,
      s"expected fewer files after compaction, got $before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == want)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = o.join(c, Seq("o_custkey"), "inner")
    val salted = Skew.saltedJoin(o, c, "o_custkey", salt = 7)
    assert(salted.count() == plain.count())
    val cols = plain.columns.map(col).toIndexedSeq
    assert(salted.select(cols: _*).except(plain).count() == 0)
    assert(plain.except(salted.select(cols: _*)).count() == 0)
  }
}
