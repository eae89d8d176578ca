package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off plan audit of the round-15 additions (kept with the other
  * dev mains under tools/): prints the exchange/broadcast/codegen
  * skeleton of each new query's executed plan. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q174_wordpiece_tokenize", "q176_gopher_ngrams", "q175_soft_dedup",
      "q179_domain_reweight", "q180_unigram_viterbi", "q181_tokenizer_report")) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Broadcast") ||
          l.contains("WholeStageCodegen") || l.contains("Scan "))
        .take(16).mkString("\n"))
    }
    spark.stop()
  }
}
