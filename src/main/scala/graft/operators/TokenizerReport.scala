package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** q181 — the TOKENIZER SELECTION report: all three trained families
  * (BPE q143, greedy WordPiece q174, Viterbi unigram q180) applied to
  * the same corpus, per language, in one gated frame — the number a
  * team reads before committing a tokenizer to a training run (fertility
  * drives context-window economics; the per-lang split shows who pays).
  * Each family's per-type segment counts come verbatim from its
  * memoized standalone gate, so a mismatch here localizes to the
  * COMPOSITION; the oracle splices the exact CTE fragments of the
  * three standalone twins into one chain (the q165 convention).
  *
  * Scale shape: three type-table-sized joins onto ONE corpus scan
  * (unhinted — the type tables grow with distinct corpus words, so the
  * broadcast-or-shuffle call stays with AQE; when they shuffle, the
  * first join's `w` hash partitioning is PRESERVED by the chain, so
  * the corpus side exchanges once and joins 2-3 reuse the layout),
  * then a #langs-row aggregate; the three trainings are the
  * already-memoized passes the standalone gates pay. */
object TokenizerReport {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_tokenizer_report" -> ((s, dir) => {
      val bpe = Bpe.wordSegFor(s, dir)                       // (w, n_sym)
      val wp = WordPiece.segFor(s, dir)                      // (w, n_wp)
      val uni = Unigram.segFor(s, dir).select("w", "n_uni")  // (w, n_uni)
      Tables.documents(s, dir)
        .selectExpr("lang", s"explode(${Portable.sparkToks}) AS w")
        .where("w <> ''")
        .join(bpe, Seq("w"))
        .join(wp, Seq("w"))
        .join(uni, Seq("w"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum("n_sym").cast("long").as("bpe_tokens"),
          sum("n_wp").cast("long").as("wp_tokens"),
          sum("n_uni").cast("long").as("uni_tokens"))
        .selectExpr("lang", "n_words", "bpe_tokens", "wp_tokens", "uni_tokens",
          "(10000 * bpe_tokens) div n_words AS fert_bpe_e4",
          "(10000 * wp_tokens) div n_words AS fert_wp_e4",
          "(10000 * uni_tokens) div n_words AS fert_uni_e4")
        .orderBy("lang")
    }),

    // q217 — the selection report extended with the FOURTH trained
    // family (q213's soft-EM refit model): same composed frame, one
    // more memoized seg join + fertility column, so the round's new
    // tokenizer is proven in-report exactly as the other three are
    // (q181 stays registered untouched — its hash surface is pinned)
    "q217_tokenizer_report_v2" -> ((s, dir) => {
      val bpe = Bpe.wordSegFor(s, dir)
      val wp = WordPiece.segFor(s, dir)
      val uni = Unigram.segFor(s, dir).select("w", "n_uni")
      val soft = Unigram.softEmSegFor(s, dir)
        .select(col("w"), col("n_uni").as("n_soft"))
      Tables.documents(s, dir)
        .selectExpr("lang", s"explode(${Portable.sparkToks}) AS w")
        .where("w <> ''")
        .join(bpe, Seq("w"))
        .join(wp, Seq("w"))
        .join(uni, Seq("w"))
        .join(soft, Seq("w"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum("n_sym").cast("long").as("bpe_tokens"),
          sum("n_wp").cast("long").as("wp_tokens"),
          sum("n_uni").cast("long").as("uni_tokens"),
          sum("n_soft").cast("long").as("soft_tokens"))
        .selectExpr("lang", "n_words", "bpe_tokens", "wp_tokens",
          "uni_tokens", "soft_tokens",
          "(10000 * bpe_tokens) div n_words AS fert_bpe_e4",
          "(10000 * wp_tokens) div n_words AS fert_wp_e4",
          "(10000 * uni_tokens) div n_words AS fert_uni_e4",
          "(10000 * soft_tokens) div n_words AS fert_soft_e4")
        .orderBy("lang")
    }))

  def oracle: Map[String, String] = Map(
    // one WITH chain: the BPE training CTEs (duckSqlWith), the shared
    // seed chain (v comes from BPE's — byte-identical definition), the
    // greedy walk, and the Viterbi walk — every fragment verbatim from
    // its standalone gate
    "q181_tokenizer_report" -> Bpe.duckSqlWith(
      s""",
         |${WordPiece.duckSeedCtes},
         |${WordPiece.duckApplyCtes()},
         |${Unigram.duckViterbiCtes()},
         |segbpe AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym FROM it${Bpe.DefaultMerges} GROUP BY w),
         |tok AS (
         |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_sym) AS BIGINT) AS bpe_tokens,
         |  CAST(SUM(n_wp) AS BIGINT) AS wp_tokens,
         |  CAST(SUM(n_uni) AS BIGINT) AS uni_tokens,
         |  (10000 * CAST(SUM(n_sym) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fert_bpe_e4,
         |  (10000 * CAST(SUM(n_wp) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fert_wp_e4,
         |  (10000 * CAST(SUM(n_uni) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fert_uni_e4
         |FROM tok JOIN segbpe USING (w) JOIN seg USING (w) JOIN useg USING (w)
         |WHERE w <> ''
         |GROUP BY lang ORDER BY lang""".stripMargin),

    // q217: the q181 chain + the shared q213 soft-EM fragment (rounds +
    // decode, verbatim) — the fourth seg joined as a renamed subselect
    // (usegs carries its own n_uni)
    "q217_tokenizer_report_v2" -> Bpe.duckSqlWith(
      s""",
         |${WordPiece.duckSeedCtes},
         |${WordPiece.duckApplyCtes()},
         |${Unigram.duckViterbiCtes()},
         |${Unigram.duckSoftChain},
         |segbpe AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym FROM it${Bpe.DefaultMerges} GROUP BY w),
         |sseg AS (SELECT w, n_uni AS n_soft FROM usegs),
         |tok AS (
         |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_sym) AS BIGINT) AS bpe_tokens,
         |  CAST(SUM(n_wp) AS BIGINT) AS wp_tokens,
         |  CAST(SUM(n_uni) AS BIGINT) AS uni_tokens,
         |  CAST(SUM(n_soft) AS BIGINT) AS soft_tokens,
         |  (10000 * CAST(SUM(n_sym) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fert_bpe_e4,
         |  (10000 * CAST(SUM(n_wp) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fert_wp_e4,
         |  (10000 * CAST(SUM(n_uni) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fert_uni_e4,
         |  (10000 * CAST(SUM(n_soft) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fert_soft_e4
         |FROM tok JOIN segbpe USING (w) JOIN seg USING (w) JOIN useg USING (w) JOIN sseg USING (w)
         |WHERE w <> ''
         |GROUP BY lang ORDER BY lang""".stripMargin))
}
