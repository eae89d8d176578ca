package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Bpe

/** BPE batched-merge cost curve (round-14 verdict item 2): the
  * sequential trainer pays one driver argmax round trip PER MERGE, so a
  * real ~32k-merge vocabulary means ~32k sequential Spark jobs —
  * local-mode job overhead, not data volume, dominates. The batched
  * trainer merges up to M disjoint pairs per round; this tool measures
  * wall seconds and ROUNDS for the same k across M ∈ {1, 8, 32} so the
  * iterations-vs-wall curve is a recorded number (PLANS.md round-14),
  * not a claim. Merge-list drift vs M=1 is printed alongside — batching
  * is the standard approximation (disjoint pairs' counts are
  * merge-invariant; only pairs touching a just-created symbol can be
  * deferred a round), and the drift column shows what it costs.
  *
  * Run: java -cp <spark jars + classes> graft.tools.BpeScale [sfDir] [k]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-bpe-scale")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()

    var ref: Seq[(String, String)] = Nil
    // (label, batch cap, gapExact): fixed-M approximations, then the
    // frequency-gap EXACT mode at the same caps — the gap rows must
    // show overlap == k by construction; their `rounds` column is the
    // price of exactness (ties/conflicts shrink some batches)
    val modes = Seq(("seq", 1, false), ("m8", 8, false), ("m32", 32, false),
      ("gap8", 8, true), ("gap32", 32, true))
    for ((label, batch, gap) <- modes) {
      val t0 = System.nanoTime()
      val (_, merges, rounds) = Bpe.trainSymsBatched(docs, k, batch, gapExact = gap)
      val sec = (System.nanoTime() - t0) / 1e9
      val pairs = merges.map(m => (m._2, m._3))
      if (label == "seq") ref = pairs
      val exact = pairs == ref // ORDERED merge-for-merge identity, not set overlap
      val common = pairs.toSet.intersect(ref.toSet).size
      println(f"mode=$label%6s batch=$batch%3d k=${merges.size}%4d rounds=$rounds%4d " +
        f"wall=$sec%7.1f s overlap_vs_seq=$common/${ref.size} exact=$exact")
    }
    spark.stop()
  }
}
