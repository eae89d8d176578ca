package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Sequence packing for LLM training pipelines: concatenate documents in
  * a deterministic order and slice the token stream into fixed-budget
  * training sequences (the standard concat-then-chunk packing used to
  * build pretraining batches — no padding waste, every sequence exactly
  * `budget` tokens except the last).
  *
  * Mechanics: within each shard, a running token total assigns every
  * document the half-open token interval [cum − n_toks, cum); sequence s
  * covers [s·B, (s+1)·B); a document contributes a segment row to every
  * sequence its interval overlaps (`sequence(start div B, (cum−1) div
  * B)` exploded), with `seg_tokens` the overlap length. All integer
  * arithmetic + one window — fully oracle-expressible in DuckDB.
  *
  * Scale shape: the window partitions by `shard` (documents are packed
  * WITHIN shards, the way a real pipeline packs within workers/files),
  * so the cumulative sum parallelizes across shards — never a global
  * single-partition sort. The explode emits ⌈n_toks/B⌉+1 ≤ 2 rows for
  * typical docs (only documents longer than the budget span more), so
  * output stays O(total_tokens/B + n_docs).
  */
object Packing {

  /** Token budget per training sequence. */
  val DefaultBudget = 2048

  /** Number of packing shards (a real pipeline would use its file/worker
    * parallelism here). */
  val DefaultShards = 8

  /** (doc_id, shard, seq_id, seg_tokens): the packing plan — which slice
    * of which document lands in which training sequence. */
  def packSequences(documents: DataFrame, budget: Int = DefaultBudget,
                    shards: Int = DefaultShards): DataFrame = {
    require(budget > 0 && shards > 0)
    val toks = documents.selectExpr(
      "doc_id",
      s"doc_id % $shards AS shard",
      s"cast(size($sparkToks) as bigint) AS n_toks")
    val w = Window.partitionBy("shard").orderBy("doc_id")
    toks
      .withColumn("cum", sum("n_toks").over(w))
      .withColumn("strt", col("cum") - col("n_toks"))
      .where("n_toks > 0")
      .withColumn("seq_id", explode(expr(s"sequence(strt div $budget, (cum - 1) div $budget)")))
      .selectExpr("shard", "seq_id", "doc_id",
        s"least(cum, (seq_id + 1) * ${budget}L) - greatest(strt, seq_id * ${budget}L) AS seg_tokens")
  }

  // ---------------------------------------------------------------- query

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_seq_packing" -> ((s, dir) =>
      packSequences(Tables.documents(s, dir))
        .orderBy("shard", "seq_id", "doc_id"))
  )

  def oracle: Map[String, String] = Map(
    "q56_seq_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % $DefaultShards AS shard,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_toks,
         |    CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM t),
         |s AS (SELECT *, cum - n_toks AS strt FROM c WHERE n_toks > 0),
         |e AS (
         |  SELECT shard, doc_id, strt, cum,
         |    unnest(range(strt // $DefaultBudget, (cum - 1) // $DefaultBudget + 1)) AS seq_id
         |  FROM s)
         |SELECT shard, seq_id, doc_id,
         |  CAST(least(cum, (seq_id + 1) * $DefaultBudget) - greatest(strt, seq_id * $DefaultBudget) AS BIGINT) AS seg_tokens
         |FROM e ORDER BY shard, seq_id, doc_id""".stripMargin
  )
}
