package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** IVF recall/cost sweep (round-13 verdict item 3): measure recall@5
  * and scan cost across (k centroids, Lloyd iters, nprobe) at sf0.1 to
  * pick the knee for the gated q131 configuration. Cost is reported as
  * the exact candidate fraction (candidates scored / corpus size per
  * query) — the number that scales to 100 TB, where scoring cost is
  * proportional to the inverted lists probed, not to wall time on a
  * 2000-vector test table. Results recorded in PLANS.md (round-13 IVF
  * recall section).
  *
  * Run: java -cp <spark jars + classes> graft.tools.RecallSweep [sfDir]
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-recall-sweep")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir).cache()
    val n = e.count()
    val exact = Similarity.cosineTopK(e).select("query_id", "vec_id").cache()
    exact.count()

    for (k <- Seq(16, 32, 64); iters <- Seq(2)) {
      val (cents, asg) = Similarity.ivfIndex(e, k = k, iters = iters)
      val c2 = cents.localCheckpoint()
      val a2 = asg.localCheckpoint()
      for (nprobe <- Seq(4, 8, 12, 16, 24, 32, 48, 64) if nprobe <= k) {
        val t0 = System.nanoTime()
        val approx = Similarity.ivfSearch(e, c2, a2, nprobe = nprobe)
        val rec = Similarity.recallAtK(exact, approx)
          .agg(sum("n_hit").as("h"), sum("k").as("t")).collect()(0)
        val wallMs = (System.nanoTime() - t0) / 1000000
        // candidate fraction: probed inverted-list mass per query
        val cands = Similarity.ivfProbesPublic(e, c2, nprobe = nprobe)
          .join(a2, "cid").count()
        val recall = rec.getLong(0).toDouble / rec.getLong(1)
        val frac = cands.toDouble / (10.0 * n)
        println(f"""[recall-sweep] {"k":$k,"iters":$iters,"nprobe":$nprobe,""" +
          f""""recall_at_5":$recall%.3f,"cand_frac":$frac%.3f,"wall_ms":$wallMs}""")
      }
    }
    spark.stop()
  }
}
