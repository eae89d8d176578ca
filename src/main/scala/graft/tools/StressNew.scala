package graft.tools
import graft._
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Long-document stress harness (run after building /tmp/stress_sf —
  * recipe in the round-4 commit message): catches quadratic blowups the
  * small-doc oracle corpus can't see. First timing in a session is
  * startup-dominated; compare steady-state numbers. */
object StressNew {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[stress] $label%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/tmp/stress_sf"
    t("q65 chunking")(Curation.textChunks(Tables.documents(spark, dir)).count())
    t("q66 vocab")(Curation.vocabTopK(Tables.documents(spark, dir)).count())
    t("q67 tfidf")(Curation.tfidfTop(Tables.documents(spark, dir)).count())
    t("q71 bpe")(TextAnalysis.queries("q71_bpe_tokens")(spark, dir).count())
    t("q69 simhash pairs")(Dedup.simhashPairs(Tables.documents(spark, dir)).count())
    t("q21-style shingles")(Dedup.shingled(Tables.documents(spark, dir)).count())
    spark.stop()
  }
}
