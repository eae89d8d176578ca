package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStream

/** Runnable streaming demonstration: stages the events table as a file
  * stream, runs the watermarked hourly rollup to a memory sink, then
  * exercises the incremental foreachBatch append twice (restart) plus a
  * redelivery. `sbt "runMain graft.tools.StreamDemo [sfDir]"` */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val src = Files.createTempDirectory("sd_src").toString
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(src, "p0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // declare the file's actual on-disk schema, then normalize ts exactly
    // like the batch loader (the encoding varies by testdata generation)
    val onDisk = spark.read.parquet(src).schema
    def stream = graft.Tables.adaptEventsTs(
      spark.readStream.schema(onDisk).parquet(src))

    val q = EventStream.hourlyRollup(stream)
      .writeStream.outputMode("complete").format("memory").queryName("rollup").start()
    q.processAllAvailable(); q.stop()
    println(s"[stream] rollup rows: ${spark.table("rollup").count()}")
    spark.table("rollup").orderBy("hour", "event_type").show(5, truncate = false)

    val target = Files.createTempDirectory("sd_tgt").toString + "/t"
    val ckpt = Files.createTempDirectory("sd_ck").toString
    def runInc(): Unit =
      EventStream.incrementalAppend(stream, "event_id", target, ckpt).start().awaitTermination()
    runInc()
    println(s"[stream] after first incremental run: ${spark.read.parquet(target).count()} rows")
    runInc()
    println(s"[stream] after restart (no new data): ${spark.read.parquet(target).count()} rows")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(src, "p1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    runInc()
    val t = spark.read.parquet(target)
    println(s"[stream] after redelivery: ${t.count()} rows, distinct keys: ${t.select("event_id").distinct().count()}")
    spark.stop()
  }
}
