package graft.tools

import graft._
import graft.operators.Dedup

/** ExactSubstr long-document stress (run after building /tmp/stress_sf):
  * the rebuild's per-token `exists(spans, ...)` is O(tokens × spans) in
  * interpreted HOF eval, and a 100k-token doc riddled with alternating
  * duplicate regions maximizes the span count — the shape the small
  * oracle corpus cannot produce. Measures both registered spans. */
object StressSubstr {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[stress] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = args.headOption.getOrElse("/tmp/stress_sf")
    val docs = Tables.documents(spark, dir)
    t("warmup count")(docs.count())
    t("q152 substr k=8")(Dedup.exactSubstringDedup(docs).count())
    t("q164 substr k=32")(Dedup.exactSubstringDedup(docs, k = 32).count())
    t("q139 passages")(Dedup.passageDedup(docs.select("doc_id", "text")).count())
    spark.stop()
  }
}
