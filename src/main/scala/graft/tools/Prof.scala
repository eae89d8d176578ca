package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch stage profiler for hot queries (dev utility). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    time("shingled")(graft.operators.Dedup.shingled(docs).count())
    time("signatures")(graft.operators.Dedup.signatures(docs).count())
    val sigs = graft.operators.Dedup.signatures(docs).cache()
    sigs.count()
    time("candidates(cached sigs)")(graft.operators.Dedup.candidatePairs(sigs).count())
    time("full")(graft.operators.Dedup.minhashNearDups(docs).count())
    spark.stop()
  }
}
