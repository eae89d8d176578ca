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

  test("AQE splits a skewed join partition at runtime (the no-code skew path)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // tiny thresholds so the planted hot key counts as skew at test size
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      import spark.implicits._
      // one hot key carrying ~99% of the left side
      val left = spark.range(50000).selectExpr("IF(id % 100 = 0, id, 1L) AS k", "id AS v")
      val right = spark.range(500).selectExpr("id AS k", "id * 10 AS w")
      val joined = left.join(right, "k")
      val smj = SparkTestSession.collectExec(joined) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.isSkewJoin
      }
      assert(smj.nonEmpty && smj.contains(true),
        s"AQE should mark the SMJ as a skew join, got $smj")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
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

  test("salted join stays in-plan: no RDD scan barrier, probe side codegen'd") {
    import org.apache.spark.sql.execution.{RDDScanExec, WholeStageCodegenExec}
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey"), col("c_name"))
    val salted = Skew.saltedJoin(o, c, "o_custkey", salt = 7)
    val rddScans = SparkTestSession.collectExec(salted) { case r: RDDScanExec => r }
    assert(rddScans.isEmpty,
      s"in-plan salt must not introduce an RDD scan barrier, found: $rddScans")
    // the probe (big) side's scan→salt-project must sit inside a
    // WholeStageCodegen span — the whole point of dropping zipWithIndex
    val codegenWithSalt = SparkTestSession.collectExec(salted) {
      case w: WholeStageCodegenExec if w.toString.contains("monotonically_increasing_id") => w
    }
    assert(codegenWithSalt.nonEmpty,
      "the salt projection must run inside whole-stage codegen")
  }

  test("exact-duplicate hot-key rows land on DIFFERENT sub-keys") {
    import spark.implicits._
    // the worst skew shape: one hot key whose rows are byte-identical —
    // any content-derived salt maps them all to one reducer
    val dupes = Seq.fill(64)(("hot", 1L)).toDF("k", "v").coalesce(1)
    val salts = Skew.withSalt(dupes, salt = 8).select("__salt")
      .as[Long].collect()
    assert(salts.distinct.length == 8,
      s"64 identical rows over salt=8 must hit all 8 sub-keys, got ${salts.distinct.toSeq}")
    // round-robin ⇒ perfectly even: 8 rows per sub-key
    assert(salts.groupBy(identity).values.map(_.length).toSet == Set(8))
  }
}
