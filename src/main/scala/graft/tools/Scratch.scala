package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B harness for optimization candidates (not registered,
  * not part of the driver contract). */
object Scratch {
  def time(label: String, reps: Int)(f: => Long): Unit = {
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $label rep$r n=$n t=$t%.3f")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.customCostEvaluatorClass",
        "graft.plans.GraftCostEvaluator")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    import graft.operators.Dedup
    val toksE = graft.functions.Portable.sparkToks

    def shingledSpread(d: DataFrame): DataFrame =
      d.select(col("doc_id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism)
        .where(s"size($toksE) >= 2")
        .selectExpr("doc_id", s"$toksE AS toks")
        .selectExpr("doc_id",
          "array_distinct(transform(sequence(0, size(toks) - 2), " +
          "i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))) AS sh")

    val sh = Dedup.shingled(docs)
    time("shingled_old", 3) { sh.write.format("noop").mode("overwrite").save(); 0L }
    val sh2 = shingledSpread(docs)
    time("shingled_spread", 3) { sh2.write.format("noop").mode("overwrite").save(); 0L }
    // does AQE collapse the post-shuffle stage?
    println("[scratch] spread partitions=" + sh2.rdd.getNumPartitions)
    spark.stop()
  }
}
