package graft.tools
import graft._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

object DebugQ69 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[q69] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sigs = Dedup.simhash(docs)
    t("simhash count")(println(sigs.count()))
    val cached = sigs.cache(); cached.count()
    t("simhash cached count")(println(cached.count()))
    val ham0 = cached.toDF("doc_a", "sim_a").join(cached.toDF("doc_b", "sim_b"),
      col("sim_a") === col("sim_b") && col("doc_a") < col("doc_b"))
    t("ham0 pairs")(println(ham0.count()))
    val bands = cached.select("simhash").distinct()
      .selectExpr("simhash", "transform(sequence(0, 3), b -> (simhash >> (b * 12)) & 4095) AS bvs")
      .select(col("simhash"), posexplode(col("bvs")).as(Seq("band", "bv")))
    t("bands count")(println(bands.count()))
    val cand = bands.toDF("sig_a", "band_a", "bv_a")
      .join(bands.toDF("sig_b", "band_b", "bv_b"),
        col("band_a") === col("band_b") && col("bv_a") === col("bv_b") && col("sig_a") < col("sig_b"))
      .select("sig_a", "sig_b")
    t("raw candidates")(println(cand.count()))
    val dist = cand.distinct()
    t("distinct candidates")(println(dist.count()))
    val conf = dist.where("bit_count(sig_a ^ sig_b) BETWEEN 1 AND 3")
    t("confirmed sig pairs")(println(conf.count()))
    t("full q69")(println(Dedup.simhashPairs(docs).count()))
    spark.stop()
  }
}
