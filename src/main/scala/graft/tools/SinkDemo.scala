package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Sinks

/** Runnable sink-layer demonstration: partitioned write + pruned read,
  * bucketed write + Exchange-free join, salted join equivalence.
  * `sbt "runMain graft.tools.SinkDemo [sfDir]"` */
object SinkDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", Files.createTempDirectory("wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = Files.createTempDirectory("sink_demo").toString
    val o = graft.Tables.orders(spark, sfDir)
    Sinks.writePartitioned(o.withColumn("status", col("o_orderstatus")), s"$out/orders_p", Seq("status"))
    val pruned = spark.read.parquet(s"$out/orders_p").where("status = 'F'")
    println(s"[sink] partitioned read, status=F: ${pruned.count()} rows; " +
      s"partition dirs scanned contain status=O: ${pruned.queryExecution.executedPlan.toString.contains("status=O")}")

    Sinks.writeBucketed(o, "o_b", "o_custkey", 8)
    Sinks.writeBucketed(graft.Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey"), "c_b", "o_custkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = Sinks.table(spark, "o_b").join(Sinks.table(spark, "c_b"), "o_custkey")
    println(s"[sink] bucketed join rows: ${j.count()}; plan has Exchange: " +
      s"${j.queryExecution.executedPlan.toString.contains("Exchange")}")

    val c = graft.Tables.customer(spark, sfDir).select(col("c_custkey").as("o_custkey"), col("c_name"))
    val salted = Skew.saltedJoin(o.select("o_orderkey", "o_custkey"), c, "o_custkey", 7)
    val plain = o.select("o_orderkey", "o_custkey").join(c, Seq("o_custkey"))
    println(s"[sink] salted join rows: ${salted.count()} (plain: ${plain.count()})")
    spark.stop()
  }
}
