package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Unigram-LM tokenizer, single-shot Viterbi fit (q180) — the third
  * tokenizer family next to BPE and greedy WordPiece: piece inventory =
  * the q173 frequency-seeded vocabulary, piece log-probs from its exact
  * counts, segmentation = the TRUE Viterbi optimum per word (Kudo 2018
  * §3, decoding with ℓ(x) = Σ log p(piece) maximized over the whole
  * lattice — not the greedy approximation). The EM re-estimation loop
  * stays documented out of scope: soft expected counts are normalized
  * lattice sums (products), which the integer fixed-point oracle
  * contract can't carry; the VITERBI decode needs only SUMS of
  * e6-rounded logs, so it fits the contract exactly.
  *
  * The whole DP rides ONE packed integer per lattice position:
  * packed = (score_e6 + 10^12)·1024 + (1023 − ntok). Extending a path by
  * a piece with score s is `packed + s·1024 − 1` (pure addition), and
  * integer MAX implements the (max score, then min tokens) tie-break in
  * one comparison — both engines agree on integer max, so segmentation
  * scores AND token counts are cross-engine exact. The 10-bit token
  * budget caps words at 1023 chars, ENFORCED in-plan ON BOTH ENGINES
  * (Spark raise_error here, a matching error() arm in the twin's useg
  * CTE — the contract fails loudly on whichever side hits it first,
  * never silently corrupts the oracle).
  *
  * Scale shape — the BPE/WordPiece bound: the word-TYPE count is the
  * only corpus-sized training stage; scoring runs per TYPE as an IN-ROW
  * fold over the word's positions (≤ 6 candidate pieces per position
  * looked up in a per-word score map — no joins, no shuffles inside the
  * DP), and the apply is the type-sized segment frame joined (UNhinted
  * — it scales with distinct words, so AQE broadcasts it only when
  * genuinely small; see [[Bpe.bpeTokenCounts]]) onto one corpus scan. The DuckDB twin walks the same recurrence as a
  * recursive CTE carrying the last 6 packed bests as columns (the
  * aggregate-free sliding window a recursive term allows), so the two
  * engines take structurally different routes to the same integers —
  * the q168/q176 in-row vs declarative convention. */
object Unigram {

  /** Score offset: keeps packed values positive (a word's total log
    * score is ≥ −2.8e10 at the 1023-char guard; 10^12 dwarfs it). */
  private val Off = 1000000000000L

  /** (w, n_uni, score_e6) per word TYPE — the Viterbi-optimal token
    * count and path score under the seeded unigram model. */
  private[graft] def segCounts(types: DataFrame): DataFrame = {
    val cands = WordPiece.candidates(types).localCheckpoint()
    val vocab = WordPiece.vocabFrom(cands)
    // piece scores: e6-rounded log-prob against the vocabulary's exact
    // count total (a 1-row broadcast)
    val tot = vocab.agg(sum("c").as("tot"))
    val scored = vocab.crossJoin(broadcast(tot))
      .selectExpr("s", "cast(round(1e6 * (ln(c) - ln(tot))) as bigint) AS s_e6")
    // per word: map (start·8 + len) → piece score, for the in-row DP
    val scoreMap = cands
      .join(broadcast(scored), Seq("s"))
      .groupBy("w")
      .agg(map_from_entries(collect_list(
        struct((col("pos") * 8 + col("l")).as("k"), col("s_e6").as("v")))).as("m"))
    val base = s"array(cast(${Off}L * 1024 + 1023 AS bigint))"
    // best(i) = max over piece lengths l of best(i−l) + s·1024 − 1; the
    // accumulator is the best-array so far (acc[i+1] = best(i)), grown
    // one position per step — array_max skips the null (no-piece) arms
    val dp =
      s"""aggregate(
         |  sequence(1, length(w)),
         |  $base,
         |  (acc, i) -> concat(acc, array(array_max(
         |    transform(sequence(1, least(${WordPiece.MaxPieceLen}, i)),
         |      l -> element_at(acc, i - l + 1) +
         |           element_at(m, cast((i - l) * 8 + l AS bigint)) * 1024L - 1L)))),
         |  acc -> element_at(acc, size(acc)))""".stripMargin
    scoreMap
      .selectExpr("w",
        // the 10-bit token budget binds at 1023 chars — refuse loudly
        s"""IF(length(w) > 1023,
           |   cast(raise_error(concat('unigram: word past the 1023-char packed budget: ', w)) AS bigint),
           |   $dp) AS packed""".stripMargin)
      .selectExpr("w",
        "cast(1023 - (packed % 1024) AS bigint) AS n_uni",
        s"cast((packed div 1024) - ${Off}L AS bigint) AS score_e6")
  }

  /** Per-(session, sfDir) memo (the Bpe.trainMemo precedent). */
  private val segMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  Memos.register(() => segMemo.synchronized(segMemo.clear()))
  private[operators] def segFor(s: SparkSession, dir: String): DataFrame =
    segMemo.synchronized {
      segMemo.getOrElseUpdate((s, dir),
        segCounts(WordPiece.wordTypes(Tables.documents(s, dir))).localCheckpoint())
    }

  /** q180: the Viterbi segmentation applied back to the corpus — per
    * doc, word count, optimal token count, and total path score. */
  def unigramTokenCounts(docs: DataFrame, seg: DataFrame): DataFrame =
    docs.selectExpr("doc_id", s"explode(${Portable.sparkToks}) AS w")
      .where("w <> ''")
      .join(seg, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_uni").cast("long").as("n_uni_tokens"),
        sum("score_e6").cast("long").as("score_e6"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q180_unigram_viterbi" -> ((s, dir) =>
      unigramTokenCounts(Tables.documents(s, dir), segFor(s, dir))))

  /** Score + pivot + recursive Viterbi walk + seg, names parameterized
    * for clash-free splicing (q181); assumes `v`, `cand`, `vocab` from
    * [[WordPiece.duckVDef]]/[[WordPiece.duckSeedCtes]] are in scope. */
  private[operators] def duckViterbiCtes(tot: String = "tot",
      sc: String = "sc", piv: String = "piv", walk: String = "uwalk",
      seg: String = "useg"): String =
    s"""$tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM vocab),
       |$sc AS MATERIALIZED (
       |  SELECT cand.w, cand.pos + cand.l AS i, cand.l,
       |    CAST(round(1e6 * (ln(vocab.c) - ln($tot.tot))) AS BIGINT) AS s_e6
       |  FROM cand JOIN vocab ON substr(cand.w, CAST(cand.pos + 1 AS INT), CAST(cand.l AS INT)) = vocab.s
       |  CROSS JOIN $tot),
       |$piv AS MATERIALIZED (
       |  SELECT w, i,
       |    MAX(CASE WHEN l = 1 THEN s_e6 END) AS s1, MAX(CASE WHEN l = 2 THEN s_e6 END) AS s2,
       |    MAX(CASE WHEN l = 3 THEN s_e6 END) AS s3, MAX(CASE WHEN l = 4 THEN s_e6 END) AS s4,
       |    MAX(CASE WHEN l = 5 THEN s_e6 END) AS s5, MAX(CASE WHEN l = 6 THEN s_e6 END) AS s6
       |  FROM $sc GROUP BY w, i),
       |$walk AS (
       |  SELECT w, CAST(0 AS BIGINT) AS i,
       |    CAST($Off * 1024 + 1023 AS BIGINT) AS b0,
       |    CAST(NULL AS BIGINT) AS b1, CAST(NULL AS BIGINT) AS b2, CAST(NULL AS BIGINT) AS b3,
       |    CAST(NULL AS BIGINT) AS b4, CAST(NULL AS BIGINT) AS b5
       |  FROM v
       |  UNION ALL
       |  SELECT $walk.w, $piv.i,
       |    greatest(
       |      $walk.b0 + $piv.s1 * 1024 - 1,
       |      $walk.b1 + $piv.s2 * 1024 - 1,
       |      $walk.b2 + $piv.s3 * 1024 - 1,
       |      $walk.b3 + $piv.s4 * 1024 - 1,
       |      $walk.b4 + $piv.s5 * 1024 - 1,
       |      $walk.b5 + $piv.s6 * 1024 - 1),
       |    $walk.b0, $walk.b1, $walk.b2, $walk.b3, $walk.b4
       |  FROM $walk JOIN $piv ON $piv.w = $walk.w AND $piv.i = $walk.i + 1),
       |$seg AS (
       |  SELECT v.w,
       |    CASE WHEN length(v.w) > 1023
       |      THEN CAST(error('unigram: word past the 1023-char packed budget: ' || v.w) AS BIGINT)
       |      ELSE CAST(1023 - ($walk.b0 % 1024) AS BIGINT) END AS n_uni,
       |    CAST(($walk.b0 // 1024) - $Off AS BIGINT) AS score_e6
       |  FROM v JOIN $walk ON $walk.w = v.w AND $walk.i = length(v.w))""".stripMargin

  def oracle: Map[String, String] = Map(
    // the same recurrence as a recursive CTE: the last 6 packed bests
    // ride as columns (b0..b5), so each step is aggregate-free; words
    // leave the walk when position i exceeds their length
    "q180_unigram_viterbi" ->
      s"""WITH RECURSIVE ${WordPiece.duckVDef},
         |${WordPiece.duckSeedCtes},
         |${duckViterbiCtes()},
         |tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_uni) AS BIGINT) AS n_uni_tokens,
         |  CAST(SUM(score_e6) AS BIGINT) AS score_e6
         |FROM tok JOIN useg USING (w) WHERE w <> ''
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
