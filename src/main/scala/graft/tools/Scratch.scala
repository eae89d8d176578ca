package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.Similarity

/** Throwaway profiling harness for q36 phases — NOT part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val e = Tables.embeddings(spark, sfDir)
    time("raw scan count")(e.count())
    // warm
    (1 to 2).foreach { i =>
      time(s"full q36 run $i") {
        val (c, a) = Similarity.ivfIndex(e)
        Similarity.ivfSearch(e, c, a).count()
      }
    }
    val (cents, asg) = time("ivfIndex total") { Similarity.ivfIndex(e) }
    time("final assignment count")(asg.count())
    time("ivfSearch count")(Similarity.ivfSearch(e, cents, asg).count())
    time("ivfSearch again")(Similarity.ivfSearch(e, cents, asg).count())
    spark.stop()
  }
}
