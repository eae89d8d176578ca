package graft.tools

import org.apache.spark.sql.SparkSession

/** Local measurement drill (not part of the driver contract): for each
  * named query, times DataFrame CONSTRUCTION+analysis separately from
  * the executed count, over several reps, so driver-side planning cost
  * is visible next to execution cost. Usage:
  *   java ... graft.tools.Drill <sfDir> <reps> q01... q02...
  */
object Drill {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.customCostEvaluatorClass",
        "graft.plans.GraftCostEvaluator")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up pass (same as Bench)
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) => println(s"$n WARMUP FAIL: $e") }
    }
    names.foreach { n =>
      (1 to reps).foreach { r =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        println(f"[drill] $n rep$r build=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
