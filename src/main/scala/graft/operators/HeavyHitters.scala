package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Misra-Gries heavy hitters as a typed [[Aggregator]] (§2.10 UDAF
  * surface) — the bounded-state frequent-items sketch a 100 TB token
  * stream needs: exact top-k via groupBy costs a full shuffle of the
  * vocabulary; Misra-Gries keeps ≤ k−1 counters PER PARTITION, merges
  * associatively (Agarwal et al., "Mergeable Summaries", PODS'12), and
  * guarantees after any merge tree:
  *
  *   - every item with true count > n/k survives in the summary;
  *   - estimates only undercount, by at most n/k.
  *
  * The sketch itself is merge-order-dependent (like any MG), so the
  * oracle contract is q47's within-bounds pattern: Spark emits the
  * EXACT heavy hitters (deterministic) plus booleans asserting the
  * sketch guarantees held against the real sketch; the DuckDB twin
  * computes the same exact set with literal TRUE flags. A hash match
  * therefore verifies the error bound end-to-end, not just row counts. */
object HeavyHitters {

  /** Summary buffer: parallel seqs (product-encodable). ≤ k−1 entries. */
  case class MGBuf(ks: Seq[String], vs: Seq[Long])

  class MisraGries(k: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k >= 2, "Misra-Gries needs k >= 2")

    def zero: MGBuf = MGBuf(Nil, Nil)

    def reduce(b: MGBuf, tok: String): MGBuf = {
      val i = b.ks.indexOf(tok)
      if (i >= 0) MGBuf(b.ks, b.vs.updated(i, b.vs(i) + 1))
      else if (b.ks.size < k - 1) MGBuf(tok +: b.ks, 1L +: b.vs)
      else { // classic decrement step: all counters − 1, drop zeros
        val kept = (b.ks zip b.vs).map { case (t, c) => (t, c - 1) }.filter(_._2 > 0)
        MGBuf(kept.map(_._1), kept.map(_._2))
      }
    }

    def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
      val sum = scala.collection.mutable.Map.empty[String, Long]
      (b1.ks zip b1.vs).foreach { case (t, c) => sum(t) = sum.getOrElse(t, 0L) + c }
      (b2.ks zip b2.vs).foreach { case (t, c) => sum(t) = sum.getOrElse(t, 0L) + c }
      if (sum.size <= k - 1) MGBuf(sum.keys.toSeq, sum.keys.toSeq.map(sum))
      else { // subtract the k-th largest count, keep strictly-positive rest
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        val kept = sum.toSeq.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0)
        MGBuf(kept.map(_._1), kept.map(_._2))
      }
    }

    def finish(b: MGBuf): Map[String, Long] = (b.ks zip b.vs).toMap
    def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Exact heavy hitters (tokens with count·k > n) over a `tok` column,
    * with the sketch's guarantees checked against a REAL Misra-Gries run
    * over the same stream. Exact side: one partial-aggregated groupBy;
    * sketch side: one pass with ≤ k−1 counters per partition and a
    * merge of #partitions summaries (a model-sized result, not data). */
  def heavyHitters(toks: DataFrame, k: Int = 16): DataFrame = {
    val est: Map[String, Long] =
      toks.select(udaf(new MisraGries(k)).apply(col("tok")))
        .head().getMap[String, Long](0).toMap
    // vocab-sized frame: localCheckpoint so the total-count action and
    // the heavy filter reuse ONE scan of the token stream (not three)
    val exactAll = toks.groupBy("tok").agg(count(lit(1)).as("cnt")).localCheckpoint()
    // sum over an empty vocab is null — an empty corpus must yield an
    // empty result, not an NPE
    val n = Option(exactAll.agg(sum("cnt")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val exact = exactAll.where(col("cnt") * k > n)
    val estMap = typedLit(est)
    exact.select(col("tok"), col("cnt"),
        element_at(estMap, col("tok")).isNotNull.as("in_sketch"),
        (col("cnt") - coalesce(element_at(estMap, col("tok")), lit(0L)) <= n / k + 1).as("within_bound"))
      .orderBy("tok")
  }

  /** The natural corpus is near-uniform (no token clears n/16), so the
    * query PLANTS a deterministic Zipf head — per document, zipf_0 ×10,
    * zipf_1 ×6, zipf_2 ×2 — giving two true heavy hitters, a near-miss,
    * and a long tail: the sketch runs with constant counter churn
    * (k−1 = 15 counters vs a ~34-token vocabulary), which is exactly
    * the regime the MG guarantees are FOR. */
  private val zipfCounts = Seq("zipf_0" -> 10, "zipf_1" -> 6, "zipf_2" -> 2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_heavy_hitters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val natural = docs.where("length(trim(text)) > 0")
        .selectExpr(s"$sparkToks AS toks")
        .select(explode(col("toks")).as("tok"))
      val plantedArr = zipfCounts
        .map { case (t, c) => s"array_repeat('$t', $c)" }.mkString("concat(", ", ", ")")
      val planted = docs.select(explode(expr(plantedArr)).as("tok"))
      heavyHitters(natural.unionByName(planted))
    }))

  def oracle: Map[String, String] = {
    val plantedList = zipfCounts
      .flatMap { case (t, c) => Seq.fill(c)(s"'$t'") }.mkString("[", ", ", "]")
    Map(
      "q78_heavy_hitters" ->
        s"""WITH toks AS (
           |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
           |  FROM documents WHERE length(trim(text)) > 0
           |  UNION ALL
           |  SELECT unnest($plantedList) AS tok FROM documents),
           |tot AS (SELECT COUNT(*) AS n FROM toks),
           |ex AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
           |SELECT tok, CAST(c AS BIGINT) AS cnt, TRUE AS in_sketch, TRUE AS within_bound
           |FROM ex, tot WHERE c * 16 > n ORDER BY tok""".stripMargin)
  }
}
