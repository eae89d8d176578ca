package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** WordPiece-style tokenizer (q173 vocab / q174 apply) — the second
  * tokenizer family next to BPE (`Bpe.scala`): a fixed-size subword
  * vocabulary seeded by weighted substring frequency (the SentencePiece
  * seed heuristic, Kudo 2018 §4: "frequent substrings" make the seed
  * inventory), deployed by greedy LONGEST-MATCH-FIRST inference — the
  * MaxMatch algorithm WordPiece ships with (Wu et al. 2016; Song et al.
  * 2021 "Fast WordPiece Tokenization" is MaxMatch made linear-time).
  * One shared piece inventory (no ##-continuation split — the MaxMatch
  * structure is identical, the split is a display convention); all
  * single characters are always in-vocab, so coverage is total and no
  * OOV path exists. The TRUE Viterbi decode over the same inventory
  * ships as q180 ([[Unigram]]); the unigram-EM re-estimation loop stays
  * out of scope there too: its forward scores are products the integer
  * fixed-point oracle contract can't carry (the q98/q130 e6-log
  * convention covers SUMS of logs, not normalized lattice sums).
  *
  * Scale shape — the same two-corpus-scan bound BPE training has:
  *  (1) the word-TYPE count (`explode → groupBy(w)`, one map-side-
  *      combined shuffle) is the only corpus-sized training stage; every
  *      other frame is type-table-sized (types × word length × ≤6
  *      candidate rows, millions not trillions at 100 TB);
  *  (2) applying the tokenizer back (q174) joins the per-word-TYPE
  *      segment counts onto ONE corpus scan — unhinted, because the
  *      type table scales with distinct corpus words (not with the
  *      fixed vocabulary): AQE broadcasts it when small and shuffles
  *      both sides on `w` at web scale.
  * The greedy walk itself is the distributed trick: longest-match makes
  * `pos → pos + step(pos)` a FUNCTIONAL graph per word, so token counts
  * are path lengths, computed by POINTER DOUBLING in ⌈log₂ maxlen⌉
  * self-joins of the type-sized step table (the q53/q59 pointer-jump
  * pattern) instead of a per-position sequential scan — at a 100-char
  * max word that is 7 rounds, not 100. The vocabulary CAP is a constant
  * by design, not a scale smell: WordPiece vocabularies are fixed-size
  * published artifacts (30k in BERT); only the seed-candidate table
  * scales with the corpus, and it is type-table-bounded.
  *
  * Determinism: piece counts are exact integers; the top-V cut orders
  * by (count DESC, piece ASC) — the lshBandBits/bpe tie convention both
  * engines compare identically. Longest-match needs no tie-break at all
  * (lengths are distinct per position). The DuckDB twin walks the same
  * step table with a recursive CTE (the q53 convention) — same vocab,
  * same steps, same path lengths, bit-identical counts. */
object WordPiece {

  /** Longest candidate piece considered (BERT's WordPiece caps
    * characters-per-input-word similarly; 6 keeps the candidate table at
    * ≤6 rows per (type, position)). The ORACLE constant — the training
    * entry points take it as a parameter so the realistic BERT-scale
    * setting (100; bounded by actual word length via the `least`) runs
    * in ScaleCheck's `wordpiece_vocab30k` without touching the q173/
    * q174 contract. */
  val MaxPieceLen = 6

  /** Multi-character vocabulary budget; single chars ride for free.
    * Oracle constant — parameterized the same way (BERT ships 30k). */
  val MultiVocab = 48

  /** (w, cnt) word types — the only corpus-sized stage. */
  private[graft] def wordTypes(docs: DataFrame): DataFrame =
    docs.selectExpr(s"explode(${Portable.sparkToks}) AS w")
      .where("w <> ''").groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Every (w, pos, l) candidate substring of every type, 1 ≤ l ≤
    * min(maxPieceLen, len − pos) — type-table-sized × ≤ len ×
    * maxPieceLen (bounded by actual word length, so a BERT-scale 100
    * costs len² on short words, not 100×). */
  private[graft] def candidates(types: DataFrame,
      maxPieceLen: Int = MaxPieceLen): DataFrame =
    types
      .withColumn("pos", explode(expr("sequence(0, length(w) - 1)")))
      .withColumn("l",
        explode(expr(s"sequence(1, least($maxPieceLen, length(w) - pos))")))
      .selectExpr("w", "cnt", "cast(pos AS bigint) AS pos",
        "cast(l AS bigint) AS l", "substring(w, pos + 1, l) AS s")

  /** The seeded vocabulary: ALL single characters (total coverage) plus
    * the top-`multiVocab` multi-char substrings by weighted count. */
  private[graft] def vocabFrom(cands: DataFrame,
      multiVocab: Int = MultiVocab): DataFrame = {
    val pc = cands.groupBy("s").agg(sum("cnt").as("c"))
    pc.where(length(col("s")) === 1).unionByName(
      pc.where(length(col("s")) > 1)
        .orderBy(col("c").desc, col("s")).limit(multiVocab))
  }

  /** (w, n_wp) — greedy longest-match token count per word TYPE.
    * step(w, pos) = longest in-vocab piece at pos (total: chars are
    * always in-vocab); the walk 0 → len is pointer-doubled. */
  private[graft] def segCounts(types: DataFrame,
      multiVocab: Int = MultiVocab,
      maxPieceLen: Int = MaxPieceLen): DataFrame =
    segCountsWithRounds(types, multiVocab, maxPieceLen)._1

  /** [[segCounts]] plus the pointer-doubling round count it actually
    * ran — ⌈log₂ maxlen⌉ by construction, INDEPENDENT of vocabulary
    * size (the scale claim ScaleCheck's `wordpiece_vocab30k` records
    * rather than assumes). */
  private[graft] def segCountsWithRounds(types: DataFrame,
      multiVocab: Int = MultiVocab,
      maxPieceLen: Int = MaxPieceLen): (DataFrame, Int) = {
    // empty/all-whitespace corpus: max(length) aggregates to NULL and
    // the eager pointer-doubling loop below has nothing to walk —
    // return the empty seg frame instead of an NPE on getInt
    val maxLenRow = types.agg(max(length(col("w")))).head()
    if (maxLenRow.isNullAt(0))
      return (types.sparkSession.range(0)
        .selectExpr("cast(null AS string) AS w", "cast(null AS bigint) AS n_wp"), 0)
    val cands = candidates(types, maxPieceLen).localCheckpoint()
    // the vocabulary is the genuinely CONSTANT-size artifact (capped at
    // multiVocab + the alphabet) — the one frame a broadcast hint is
    // structurally safe on, even at the BERT-scale 30k
    val vocab = vocabFrom(cands, multiVocab)
    val step = cands
      .join(broadcast(vocab.select("s")), Seq("s"))
      .groupBy("w", "pos").agg(max("l").as("step"))
    // jump(pos) = (to, n): from pos, after ≤2^i greedy tokens, you stand
    // at `to` having emitted n tokens; absence of `to` as a key means
    // the word end was reached and composition leaves the row fixed
    var jump = step.selectExpr("w", "pos", "pos + step AS dst", "1L AS n")
    jump = org.apache.spark.sql.graft.PlanBridge.localCheckpointFreshStats(jump)
    val maxLen = maxLenRow.getInt(0).toLong
    var covered = 1L
    var rounds = 0
    while (covered < maxLen) {
      val b = jump.selectExpr("w AS w2", "pos AS pos2", "dst AS dst2", "n AS n2")
      jump = jump
        .join(b, col("w") === col("w2") && col("dst") === col("pos2"), "left")
        .selectExpr("w", "pos", "coalesce(dst2, dst) AS dst",
          "n + coalesce(n2, 0L) AS n")
      jump = org.apache.spark.sql.graft.PlanBridge.localCheckpointFreshStats(jump)
      covered *= 2
      rounds += 1
    }
    (jump.where(col("pos") === 0).select(col("w"), col("n").as("n_wp")), rounds)
  }

  /** q173: the learned vocabulary — (piece, piece_len, cnt). */
  def wordpieceVocab(docs: DataFrame): DataFrame =
    vocabFrom(candidates(wordTypes(docs)))
      .selectExpr("s AS piece", "cast(length(s) AS bigint) AS piece_len",
        "c AS cnt")
      .orderBy("piece")

  /** q174: the trained tokenizer applied back to the corpus — per doc,
    * whitespace words and greedy-WordPiece tokens, via ONE corpus scan
    * joined (UNhinted) to the type-sized segment counts. The seg frame
    * grows with distinct corpus words — billions on a 100 TB web corpus
    * — so the hint AQE-or-shuffle decision stays with the runtime:
    * broadcast when small (every test SF), shuffle on `w` when not.
    * ScaleCheck `tokenizer_apply` pins the shuffle path at a 10M-type
    * seg frame in 512 MB; the genuinely constant-size artifact here is
    * the piece VOCABULARY (capped at MultiVocab + the alphabet), which
    * is the only frame [[segCounts]] broadcasts. */
  def wordpieceTokenCounts(docs: DataFrame): DataFrame =
    applySeg(docs, segCounts(wordTypes(docs)))

  private[graft] def applySeg(docs: DataFrame, seg: DataFrame): DataFrame =
    docs.selectExpr("doc_id", s"explode(${Portable.sparkToks}) AS w")
      .where("w <> ''")
      .join(seg, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_wp").cast("long").as("n_wp_tokens"))
      .orderBy("doc_id")

  /** q177: WordPiece fertility per language — q154's metric under the
    * second tokenizer, so the two families are comparable gate-to-gate
    * (a mixed-corpus tokenizer over-fragments the under-seen language
    * in BOTH; the per-family numbers say by how much). Same plan: the
    * type-sized seg broadcast onto one corpus scan, a #langs-row
    * aggregate, integer fixed-point ratios. */
  private def fertilityFrom(docs: DataFrame, seg: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "lang", s"explode(${Portable.sparkToks}) AS w")
      .where("w <> ''")
      .join(seg, Seq("w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("n_wp").cast("long").as("n_wp_tokens"),
        sum(length(col("w"))).cast("long").as("n_chars"))
      .selectExpr("lang", "n_words", "n_wp_tokens", "n_chars",
        "(10000 * n_wp_tokens) div n_words AS fertility_e4",
        "(10000 * n_chars) div n_wp_tokens AS chars_per_tok_e4")
      .orderBy("lang")

  /** Per-(session, sfDir) memo of the trained per-type segment counts —
    * q174 and q177 apply the IDENTICAL tokenizer (the Bpe.trainMemo
    * precedent); the walk's final frame is localCheckpoint'd by
    * construction, so repeat queries read materialized counts. */
  private val segMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  Memos.register(() => segMemo.synchronized(segMemo.clear()))
  private[operators] def segFor(s: SparkSession, dir: String): DataFrame =
    segMemo.synchronized {
      segMemo.getOrElseUpdate((s, dir),
        segCounts(wordTypes(Tables.documents(s, dir))))
    }

  /** The piece inventory as the SHIPPED artifact (vocab.txt): the
    * multiVocab + alphabet rows collected into a
    * [[graft.plans.WordPieceEncodeModel]] — the one frame of this
    * family that is constant-size by construction (the collect is the
    * bounded-model convention, k-row centroids/BPE merges). Greedy
    * MaxMatch from the same inventory reproduces the trained per-type
    * counts exactly (no tie exists), so q189 reuses q174's twin. */
  private val modelMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), graft.plans.WordPieceEncodeModel]
  Memos.register(() => modelMemo.synchronized(modelMemo.clear()))
  private[operators] def encodeModelFor(s: SparkSession, dir: String): graft.plans.WordPieceEncodeModel =
    modelMemo.synchronized {
      modelMemo.getOrElseUpdate((s, dir), {
        val pieces = vocabFrom(candidates(wordTypes(Tables.documents(s, dir))))
          .select("s").collect().map(_.getString(0))
        new graft.plans.WordPieceEncodeModel(pieces, MaxPieceLen)
      })
    }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q173_wordpiece_vocab" -> ((s, dir) =>
      wordpieceVocab(Tables.documents(s, dir))),
    "q174_wordpiece_tokenize" -> ((s, dir) =>
      applySeg(Tables.documents(s, dir), segFor(s, dir))),
    "q177_wordpiece_fertility" -> ((s, dir) =>
      fertilityFrom(Tables.documents(s, dir), segFor(s, dir))),
    // the shipped-inventory encoder — scan → map → sort, no seg join;
    // q174's pointer-doubled/recursive-walk twin gates it verbatim
    "q189_wordpiece_encode" -> ((s, dir) =>
      Bpe.encodeCounts(Tables.documents(s, dir), encodeModelFor(s, dir),
        "n_wp_tokens")))

  /** Shared CTE chain: types → candidates → vocab (→ step → recursive
    * walk for the apply tail). The walk is the q53 recursive-CTE
    * convention — each recursion step follows the unique greedy edge,
    * so MAX(n) per word IS the token count. */
  /** The word-type CTE alone — identical text to Bpe's `v`, so a
    * splicing caller (q181) takes exactly one of the two. */
  private[operators] def duckVDef: String =
    raw"""v AS MATERIALIZED (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
         |  WHERE w <> '' GROUP BY w)""".stripMargin

  /** Seed chain AFTER `v` (candidates → counts → vocab) — shared with
    * [[Unigram]]'s twin and spliceable behind any equivalent `v`. */
  private[operators] def duckSeedCtes: String =
    raw"""p1 AS (SELECT w, cnt, unnest(range(0, length(w))) AS pos FROM v),
         |cand AS MATERIALIZED (
         |  SELECT w, cnt, pos, unnest(range(1, least($MaxPieceLen, length(w) - pos) + 1)) AS l FROM p1),
         |pc AS (
         |  SELECT substr(w, CAST(pos + 1 AS INT), CAST(l AS INT)) AS s, CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM cand GROUP BY 1),
         |vocab AS MATERIALIZED (
         |  SELECT s, c FROM pc WHERE length(s) = 1
         |  UNION ALL
         |  SELECT s, c FROM (SELECT s, c FROM pc WHERE length(s) > 1 ORDER BY c DESC, s LIMIT $MultiVocab))""".stripMargin

  private def duckHead: String = s"$duckVDef,\n$duckSeedCtes"

  def oracle: Map[String, String] = Map(
    "q173_wordpiece_vocab" ->
      s"""WITH $duckHead
         |SELECT s AS piece, CAST(length(s) AS BIGINT) AS piece_len, c AS cnt
         |FROM vocab ORDER BY piece""".stripMargin,
    "q174_wordpiece_tokenize" ->
      s"""WITH RECURSIVE $duckSegCtes,
         |tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_wp) AS BIGINT) AS n_wp_tokens
         |FROM tok JOIN seg USING (w) WHERE w <> ''
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q177_wordpiece_fertility" ->
      s"""WITH RECURSIVE $duckSegCtes,
         |tok AS (
         |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_wp) AS BIGINT) AS n_wp_tokens,
         |  CAST(SUM(length(w)) AS BIGINT) AS n_chars,
         |  (10000 * CAST(SUM(n_wp) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS fertility_e4,
         |  (10000 * CAST(SUM(length(w)) AS BIGINT)) // CAST(SUM(n_wp) AS BIGINT) AS chars_per_tok_e4
         |FROM tok JOIN seg USING (w) WHERE w <> ''
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q189_wordpiece_encode" ->
      s"""WITH RECURSIVE $duckSegCtes,
         |tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_wp) AS BIGINT) AS n_wp_tokens
         |FROM tok JOIN seg USING (w) WHERE w <> ''
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** [[duckHead]] + step table + recursive walk + per-type seg counts —
    * the shared chain under both apply-side twins. */
  private def duckSegCtes: String = s"$duckHead,\n${duckApplyCtes()}"

  /** Step table + recursive greedy walk + seg counts, names
    * parameterized so q181 can splice them next to the other families'
    * fragments without CTE-name clashes. */
  private[operators] def duckApplyCtes(step: String = "step",
      walk: String = "walk", seg: String = "seg"): String =
    s"""$step AS MATERIALIZED (
       |  SELECT w, pos, MAX(l) AS step
       |  FROM cand JOIN vocab ON substr(cand.w, CAST(cand.pos + 1 AS INT), CAST(cand.l AS INT)) = vocab.s
       |  GROUP BY w, pos),
       |$walk AS (
       |  SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS n FROM v
       |  UNION ALL
       |  SELECT $walk.w, $walk.pos + $step.step, $walk.n + 1
       |  FROM $walk JOIN $step ON $step.w = $walk.w AND $step.pos = $walk.pos),
       |$seg AS (SELECT w, CAST(MAX(n) AS BIGINT) AS n_wp FROM $walk GROUP BY w)""".stripMargin
}
