package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and total
  * seconds.
  *
  * Methodology: one untimed warm-up execution per query (JIT + file-cache
  * warm-up — single-shot numbers on a fresh JVM measure the JIT compiler,
  * not the engine), then THREE timed executions per query reporting the
  * MEDIAN — round-2 driver runs showed ±4× per-query swings on unchanged
  * code under transient machine load; a median of 3 is robust to one
  * loaded rep in either direction, and the per-rep times are emitted in
  * `"reps"` so any remaining variance is visible in the JSON rather than
  * silently folded into the score. */
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
    // SPARK_GRAFT_BENCH_ONLY=q36_ann_ivf,q26_ann_lsh_pairs — local
    // single-query iteration; unset (the driver's case) runs everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warm-up: JIT, parquet footer/file cache, codegen compilation
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // three timed reps per query, report the MEDIAN; cache cleared before
    // each rep so every timed run pays its full cost. A failing query is
    // reported in "errors" and counted as -1, never as a fast success.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
                 catch { case scala.util.control.NonFatal(_) => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val median =
        if (times.contains(-1.0)) { errors += name; -1.0 }
        else times.sorted.apply(times.size / 2)
      (name, median, times)
    }
    def fmt(d: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    // Two renditions of the same result:
    //  - stdout: compact (medians only, no per-rep arrays). The driver
    //    captures a bounded tail of stdout and JSON-parses the last line;
    //    round 3's line with embedded reps grew past that window and the
    //    parse came back null, so the stdout line must stay small even as
    //    queries are added.
    //  - file: full detail including per-rep arrays, for variance audits.
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val repJson = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val head = s""""metric":"median_total","value":${fmt(total)},"unit":"sec","warmup":1,"timed_reps":$reps,"errors":$errs,"queries":$qs"""
    val compact = s"""{$head,"sf":"$sfDir"}"""
    val full = s"""{$head,"reps":$repJson,"sf":"$sfDir"}"""
    // NonFatal only: swallowing OutOfMemoryError/InterruptedException here
    // would mask a dying JVM as a bench-output hiccup.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () }
    println(compact)
    spark.stop()
  }
}
