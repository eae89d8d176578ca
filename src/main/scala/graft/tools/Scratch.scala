package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Ad-hoc scale-sweep harness (profiling evidence for PLANS.md, not part
  * of the library): replicates the sf0.1 embedding corpus with rotated
  * dimensions (a permutation keeps the component distribution but
  * decorrelates bucket signatures, so replicas behave like fresh
  * vectors) and measures multi-band LSH candidate growth vs corpus
  * size — the empirical check that corpus-scaled bits keep the
  * candidate join linear-ish in n. */
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
    val e = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS embedding")

    def replicated(factor: Int) = (0 until factor).map { r =>
      val rot = r % 32 + 1
      e.selectExpr(s"vec_id + ${r.toLong * 10000000L} AS vec_id",
        s"concat(slice(embedding, $rot + 1, 64 - $rot), slice(embedding, 1, $rot)) AS embedding")
    }.reduce(_ unionByName _)

    println(f"[sweep] ${"n"}%8s ${"nbits"}%6s ${"candidates"}%12s ${"cand/n"}%8s ${"sec"}%7s")
    Seq(1, 2, 4, 8, 16).foreach { f =>
      val corpus = replicated(f).localCheckpoint()
      val n = corpus.count()
      val nbits = graft.functions.Portable.lshBandBits(n)
      val t0 = System.nanoTime()
      // candidate PAIRS before the cosine confirm — the quantity whose
      // growth rate decides 100x viability
      val sigs = Similarity.lshBandSignatures(corpus, graft.functions.Portable.LshBands, nbits)
      val a = sigs.toDF("vec_a", "band", "bucket")
      val b = sigs.toDF("vec_b", "band", "bucket")
      val cands = a.join(b, Seq("band", "bucket"))
        .where(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] $n%8d $nbits%6d $cands%12d ${cands.toDouble / n}%8.2f $sec%7.2f")
    }
    spark.stop()
  }
}
