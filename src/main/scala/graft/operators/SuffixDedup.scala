package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable.sparkToks

/** TRUE suffix-array ExactSubstr dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" — the suffix-array form
  * their released tool implements, next to the k-gram gates q152/q164):
  * rank every token suffix of the corpus by DISTRIBUTED PREFIX DOUBLING
  * (Manber–Myers, the O(log n)-round formulation: each round extends
  * the compared prefix from 2^k to 2^(k+1) tokens via one (rank,
  * next-rank) self-join keyed on position+2^k), then suffixes ADJACENT
  * in the resulting order sharing a prefix of ≥ `minSpan` tokens mark
  * duplicate spans, which are interval-merged and cut from every
  * document.
  *
  * Semantics vs q152/q164: the suffix-array tool's self-dedup removes
  * ALL occurrences of a duplicated span (both copies — the released
  * deduplicate-text-datasets default), where the k-gram gates keep the
  * globally-first occurrence. The span set itself equals the k-gram set
  * at k = minSpan: a position p carries a duplicated minSpan-window
  * ⟺ some q ≠ p shares p's minSpan-prefix ⟺ (run argument: every
  * suffix lexicographically between p and q shares that prefix too)
  * p's immediate SA-neighbor toward q shares it — the adjacent-pair
  * LCP ≥ minSpan test. That equivalence is what lets a window-hash twin
  * oracle the suffix-array plan: two structurally different routes to
  * one answer.
  *
  * HOW the adjacency test is evaluated — by rank CLASS, not by
  * materialized neighbors: the doubling stops at depth dStop = half the
  * largest power of two ≤ minSpan, and the final class key is the ≤4
  * depth-dStop ranks at window offsets {0, dStop, 2·dStop, …,
  * minSpan−dStop} — windows that jointly COVER tokens 0..minSpan−1
  * while each stays inside the span (overlap is harmless for an
  * EQUALITY test; ceil(minSpan/dStop) ≤ 4 because dStop > minSpan/4).
  * Among positions with ≥ minSpan tokens remaining, equal class tuple
  * ⟺ equal minSpan-prefix, and since equal-prefix suffixes form a
  * contiguous run in suffix order, "my class has ≥ 2 members" IS "my
  * adjacent SA neighbor has LCP ≥ minSpan" — evaluated as one
  * count-over-class, with no adjacency frame, no token-array re-join,
  * and no slice compare. (The remaining-length filter runs BEFORE the
  * count: two equally-truncated SHORTER suffixes also share a class —
  * truncation surfaces as the shorter slice key / absent-extension
  * rank 0 at some round, so a short suffix never shares a class with a
  * long one, but two equal 48-token tails would, and marking them
  * would be a false positive at 50.)
  *
  * Why the ranked frame holds ALL positions (not just those with ≥
  * minSpan remaining): the doubling looks ranks up at pos+2^k, and a
  * filtered frame would substitute "no suffix" (rank 0) for positions
  * that exist but fell under the filter — garbling equality classes so
  * two different prefixes could collide. Short suffixes are cheap rows;
  * they never join a long suffix's class (above) and the length filter
  * keeps them out of the span set.
  *
  * Scale shape (the 100 TB posture): rounds = log2(dStop/4) + 1 ≤ 3
  * groupRank rounds for the published 50-token setting (the seed rank
  * reads a 4-token slice key straight off the doc array — depth 4 for
  * free — and the ≤4-window class test replaces the last doubling round
  * AND the composite extension), each round exactly three shuffles of the
  * NARROW (gpos, rank) frame — a range exchange for the global row
  * number (partition-LOCAL windows + inlined offsets, the
  * Relational.distributedNtile discipline: no unpartitioned window
  * anywhere in the plan), one hash shuffle keyed on the (rank,
  * next-rank) pair for the min-over-group rank (key groups are
  * positions sharing a 2^k-prefix — duplicate mass that SHRINKS
  * geometrically per round), and one equi-join on position+2^k. Early
  * exit when ranks go all-distinct (one bounded agg per round; real
  * corpora disambiguate most suffixes in the first rounds). Lineage is
  * truncated per round (localCheckpoint — the q53 pointer-jumping
  * discipline). The span tail is one count-over-class shuffle + the
  * shared q152 merge/rebuild; nothing all-pairs, nothing driver-side
  * beyond ≤`parts` partition counts per round. ScaleCheck drives the
  * whole path at ~10M tokens in a 512 MB heap.
  */
object SuffixDedup {

  /** Published ExactSubstr span threshold (Lee et al. 2022 §4.1 run
    * 50-token spans). At this setting the round-20 seed extension
    * (initDepth = dStop below) makes the doubling loop DEGENERATE: one
    * seed groupRank at depth 16 off the doc-array slice key, zero
    * extension rounds, then the ≤4-window class test — the O(log n)
    * machinery stays for any minSpan whose dStop exceeds the slice-key
    * width budget, and [[suffixRanks]]' contract is unchanged. */
  val DefaultMinSpan = 50

  /** Range-exchange partition count for the doubling rounds (grows with
    * the cluster at scale; 32 = the local shuffle width). */
  private val DefaultParts = 32

  /** The doubling loop's one materialization point per stage:
    * DISK_ONLY localCheckpoint. The loop's state frames are narrow
    * (3 columns since r18) but corpus-POSITION-sized and live for
    * several rounds;
    * the deserialized default storage held 2–3 such copies in heap and
    * starved execution memory at the 512 MB ScaleCheck ceiling (OOM in
    * the window sort's page allocation while storage was still
    * unrolling). On disk the round state costs the heap nothing and a
    * re-read of serialized narrow rows is cheap; lineage truncation
    * (the reason to checkpoint at all — the q53 discipline) is
    * unchanged. */
  private def diskCheckpoint(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)

  /** Order-preserving GROUP rank over `keys` WITHOUT an unpartitioned
    * window and WITHOUT driver-side offsets: range-repartition on the
    * key (equal keys land in ONE partition, partitions hold ascending
    * key spans), then rank = the packed (partition id, partition-LOCAL
    * row number) of the key group's FIRST row — `pid·2⁴¹ + rn`.
    * Equality: same key ⇒ same partition ⇒ same min local rn. Order:
    * partition ids ascend with the key ranges and local row numbers
    * ascend within, so the packed id is monotone in key order. Both
    * windows are partition-local over the one range exchange (the
    * min-over-group needs only ClusteredDistribution, which the range
    * partitioning already provides — no second exchange), and the
    * 2⁴¹-row per-partition budget cannot bind (that is 2.2e12 rows in
    * one partition). vs the earlier min-of-GLOBAL-row-number spelling
    * this removes the per-round driver count job, the offset CASE, and
    * one materialization — the doubling's per-round cost is ONE
    * sampling pass + ONE exchange+window+checkpoint job, which is what
    * made the registered q204 latency stage-bound, not data-bound.
    * Dense-ness of ranks is irrelevant to the doubling; only order +
    * equality matter (the classic suffix-array rank relaxation). */
  private def groupRank(df: DataFrame, keys: Seq[Column], out: String,
      parts: Int): DataFrame = {
    // the packed id budgets 2^41 rows PER PARTITION and 2^22 partitions
    // (pid·2^41 + rn must stay inside Long); parts grows with the
    // cluster, so the pid budget is enforced, not just documented
    require(parts > 0 && parts < (1 << 22),
      s"groupRank: parts must stay under 2^22 (4.2M) so pid*2^41 + rn " +
        s"cannot overflow Long; got $parts")
    val byPid = Window.partitionBy("__pid").orderBy(keys: _*)
    val byKey = Window.partitionBy(keys: _*)
    df.repartitionByRange(parts, keys: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .withColumn("__rn0", row_number().over(byPid).cast("long"))
      .withColumn(out,
        min(col("__pid") * lit(1L << 41) + col("__rn0")).over(byKey))
      .drop("__pid", "__rn0")
  }

  /** Prefix-doubled suffix ranks over a position frame. Required
    * columns: `gpos` (packed doc_id·2^20 + pos — the per-doc positional
    * budget already enforced upstream), `pos` (1-based) and `tok` (the
    * token AT pos — or, when `initDepth` > 1, the first `initDepth`
    * tokens AT pos joined into one string: a slice key read straight
    * off the document array at explode time, which starts the doubling
    * at depth `initDepth` for FREE — no joins, no extra rounds). At
    * initDepth > 1 the joined-string seed is EQUALITY-exact only: its
    * sort order can differ from token-wise order (the join separator
    * interleaves), so rank equality ⟺ equal capped prefixes holds at
    * every depth, but the lexicographic rank-ORDER contract below is
    * guaranteed only on the default initDepth = 1 path — exactly what
    * the only initDepth > 1 caller ([[dupSpans]], an equality-class
    * test) needs. Every other column rides through untouched. Output:
    * the input columns minus `tok`, plus `rank`, where `rank` (at
    * initDepth = 1) orders suffixes lexicographically by their first
    * `maxDepth` tokens (a shorter suffix sorts before a longer one
    * sharing its prefix — the absent-extension rank 0), equal ranks ⟺
    * equal capped prefixes.
    * `maxDepth` must be `initDepth`·2^k (the doubling lands on exactly
    * those depths). Stops early when ranks go all-distinct (full lex
    * order reached). SuffixArraySpec pins rank order ≡ a sequential
    * suffix sort. */
  private[graft] def suffixRanks(pos0: DataFrame, maxDepth: Int,
      parts: Int = DefaultParts, earlyExit: Boolean = true,
      initDepth: Int = 1): DataFrame = {
    require(maxDepth >= 1 && initDepth >= 1 && maxDepth % initDepth == 0 &&
      Integer.bitCount(maxDepth / initDepth) == 1,
      s"suffixRanks: maxDepth ($maxDepth) must be initDepth ($initDepth) times a power of two")
    var p = diskCheckpoint(
      groupRank(pos0, Seq(col("tok")), "rank", parts).drop("tok"))
    var step = initDepth.toLong
    var distinctRanks = false
    while (step < maxDepth && !distinctRanks) {
      // the all-distinct probe is an optimization for corpora whose
      // suffixes disambiguate early; a corpus KNOWN to carry ≥maxDepth
      // duplicated runs (q204's planted one) can never exit early, so
      // its caller skips the two agg jobs per round outright
      distinctRanks = earlyExit && {
        val d = p.agg(count(lit(1)).as("n"),
          countDistinct(col("rank")).as("nd")).head()
        d.getLong(0) == d.getLong(1)
      }
      if (!distinctRanks) {
        // checkpoint EVERY round: a skipped intermediate looked like a
        // saved disk write+read+job, but the next extend SELF-join then
        // re-evaluates the un-materialized round once per side (the
        // exchange under the window is reused, the window itself is
        // not) — measured 2.9 → 4.9 s at sf0.1, strictly worse
        p = diskCheckpoint(
          groupRank(extendRanks(p, step), Seq(col("rank"), col("r2")),
              "rank2x", parts)
            .drop("rank", "r2")
            .withColumnRenamed("rank2x", "rank"))
        step *= 2
      }
    }
    p
  }

  /** One rank extension: attach `r2` = the rank of the suffix at
    * pos+`step` (0 when the suffix ends first — real ranks are global
    * row numbers ≥ 1, so the short suffix sorts first, the standard
    * doubling convention). The equi-join key is the packed position —
    * gpos+step stays inside the doc's packed space by the caller's
    * budget guard.
    *
    * The lookup side carries a MERGE hint — the inverse of the repo's
    * forced-broadcast rule: this side is BY CONSTRUCTION the same
    * position-frame as `p` (one row per corpus token), never
    * broadcastable at any scale, while the checkpointed frame inherits
    * its ORIGIN plan's size estimate (LogicalRDD keeps originStats), so
    * a synthetic range-derived corpus estimates tiny and planned a 10M-
    * row broadcast build — the 512 MB ScaleCheck found exactly that
    * driver OOM. Pinning the structurally-correct shuffle join is the
    * honest fix; hinting what is provably true is not the q95/q99
    * anti-pattern (hinting what is merely hoped). */
  private def extendRanks(p: DataFrame, step: Long): DataFrame = {
    val lookup = p.select(col("gpos").as("gpos2"), col("rank").as("rank2"))
    p.withColumn("g2", col("gpos") + lit(step))
      .join(lookup.hint("merge"), col("g2") === col("gpos2"), "left")
      .withColumn("r2", coalesce(col("rank2"), lit(0L)))
      .drop("gpos2", "rank2", "g2")
  }

  /** The planted long-span corpus for q204 (the q192/q203 plant
    * convention — the raw testdata has almost no natural 50-token
    * repeats, so without plants the span set would be nearly empty):
    * every 17th doc long enough donates a 55-token interior window,
    * re-housed in a fresh doc between unique flank tokens (so the copy
    * is a SPAN duplicate, never an exact-doc one). Plant ids sit at
    * max(doc_id)+1 + donor id — derived, never a fixed constant (a
    * corpus whose ids reach a hard-coded offset would silently collide
    * plants with real docs). One Spark construction and one DuckDB CTE
    * ([[oracle]]'s `pl`) serve both engines. */
  private[graft] def plantedSpanCorpus(d: DataFrame,
      withSource: Boolean = false): DataFrame = {
    val keep = if (withSource) Seq("doc_id", "text", "source")
               else Seq("doc_id", "text")
    val d0 = d.select(keep.map(col): _*)
    val off = d0.agg(max("doc_id")).first.getLong(0) + 1
    // plants carry their own 'plant' source when the caller needs one
    // (q214's source-cap stage treats them as one fresh domain — the
    // same literal on both engines)
    // donor offset 3 behind ONE flank token: plant position p holds
    // donor token p+1, so every 8-aligned plant passage straddles two
    // donor grid cells — q139's verbatim-cell dedup can NEVER match it
    // (offset 2 would re-create donor alignment: plant pos p = donor
    // pos p — the round-18 off-by-one the q224 funnel exposed, with the
    // passage stage silently doing the suffix stage's work in-chain)
    val plantCols = Seq(s"doc_id + ${off}L AS doc_id",
      "concat('xs', cast(doc_id as string), ' ', " +
        "array_join(slice(toks, 3, 55), ' '), " +
        "' xe', cast(doc_id as string)) AS text") ++
      (if (withSource) Seq("'plant' AS source") else Nil)
    d0.unionByName(
      d0.selectExpr("doc_id", s"$sparkToks AS toks")
        .where("doc_id % 17 = 5 AND size(toks) >= 62")
        .selectExpr(plantCols: _*))
  }

  private[operators] def duckPlantCtes(withSource: Boolean = false): String = {
    val srcPl = if (withSource) ", 'plant' AS source" else ""
    val srcSel = if (withSource) ", source" else ""
    s"""mx AS (SELECT MAX(doc_id) + 1 AS off FROM documents),
      |pl AS (
      |  -- donor id aliased `did`: DuckDB's lateral column aliases would
      |  -- otherwise bind the flank tokens to the OFFSET id and fork the
      |  -- plant from the Spark construction
      |  SELECT did + mx.off AS doc_id,
      |    'xs' || CAST(did AS VARCHAR) || ' ' ||
      |    array_to_string(toks[3:57], ' ') ||
      |    ' xe' || CAST(did AS VARCHAR) AS text$srcPl
      |  FROM (SELECT doc_id AS did, regexp_split_to_array(trim(text), '\\s+') AS toks
      |        FROM documents) CROSS JOIN mx
      |  WHERE did % 17 = 5 AND len(toks) >= 62),
      |corpus AS (
      |  SELECT doc_id, text$srcSel FROM documents
      |  UNION ALL SELECT doc_id, text$srcSel FROM pl)""".stripMargin
  }

  /** q204 core — the suffix-array dedup over a (doc_id, text) corpus.
    * Output matches the q152 surface: (doc_id, n_tokens, n_removed,
    * clean_fp) for EVERY input doc, with all occurrences of every
    * ≥minSpan-token duplicated span removed.
    *
    * Round-18 job-count cut (the r17 verdict's Next #3 — q204's latency
    * was stage-bound, ~20 jobs at 5.4 s): the depth-minSpan equality
    * test never needed ranks at depth minSpan, only a class key whose
    * components jointly COVER [0, minSpan) — so the doubling stops at
    * dStop = d1/2 and the class key becomes the ≤4 depth-dStop ranks at
    * window offsets {0, dStop, 2·dStop, …, minSpan − dStop} (every
    * window inside [0, minSpan); overlap is harmless for equality, the
    * same argument the old single composite extension used, applied
    * ceil(minSpan/dStop) ≤ 4 times since dStop > minSpan/4). The seed
    * rank reads the first min(4, dStop) tokens straight off the doc
    * array as a slice key (free at explode time), starting the doubling
    * at depth 4. Net for the published minSpan = 50: groupRank rounds
    * at depths 4 → 8 → 16 (three range exchanges + checkpoints) where
    * the old plan ran six plus a final extension — the identical span
    * set in roughly half the stages. The multi-offset lookup is ONE
    * self-join (lookup side exploded per offset) whose pivot-back
    * reuses the join's hash partitioning on gpos (no extra exchange),
    * then the one count-over-class shuffle. */
  def suffixArrayDedup(docs: DataFrame, minSpan: Int = DefaultMinSpan,
      parts: Int = DefaultParts, earlyExit: Boolean = true): DataFrame = {
    val t = spreadDocs(docs).selectExpr("doc_id", s"$sparkToks AS toks")
    Dedup.cutSpans(t, dupSpans(t, minSpan, parts, earlyExit))
  }

  /** Scan-parallelism rescue for the position explode: the driver's
    * testdata ships one row group per file, so a raw corpus scan is ONE
    * task and the ~tokens-sized explode+slice+fingerprint work under
    * [[dupSpans]] would serialize on it (guide §2.5's unsplittable-
    * input case — "otherwise repartition immediately after the read").
    * Fires ONLY when the planned layout is narrower than the session
    * parallelism: a 100 TB scan arrives thousands-of-splits wide and a
    * mid-pipeline (already shuffled) caller passes straight through, so
    * the exchange does not exist where it isn't needed. Deterministic
    * hash key (doc_id), not round-robin. */
  private def spreadDocs(docs: DataFrame): DataFrame = {
    val target = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions < target) docs.repartition(target, col("doc_id"))
    else docs
  }

  /** The span CUT as a REWRITE — (doc_id, text_kept) for every input
    * doc, all occurrences of every ≥minSpan-token duplicated span
    * removed — the form a curation pipeline COMPOSES (q214 inserts it
    * between passage dedup and the quality gate, where
    * [[suffixArrayDedup]] is the standalone audit surface). */
  def suffixCutText(docs: DataFrame, minSpan: Int = DefaultMinSpan,
      parts: Int = DefaultParts, earlyExit: Boolean = true): DataFrame = {
    val t = spreadDocs(docs).selectExpr("doc_id", s"$sparkToks AS toks")
    Dedup.cutSpansKept(t, dupSpans(t, minSpan, parts, earlyExit))
      .selectExpr("doc_id", "array_join(kept, ' ') AS text_kept")
  }

  /** Duplicated-span frame (doc_id, s, e) of a tokenized corpus
    * (doc_id, toks) — the whole suffix-array machinery up to (but not
    * including) the interval merge + cut, shared by the fingerprint and
    * rewrite surfaces. */
  private def dupSpans(t: DataFrame, minSpan: Int,
      parts: Int, earlyExit: Boolean): DataFrame = {
    require(minSpan >= 2)
    val d1 = Integer.highestOneBit(minSpan)
    // stop the doubling at HALF the largest power of two ≤ minSpan and
    // close the gap with the ≤4-window class key (scaladoc above)
    val dStop = math.max(1, d1 / 2)
    // the slice seed taken ALL THE WAY to dStop (the r18 trick run to
    // its fixed point, the r19 verdict's Next #6): the seed key is the
    // first dStop tokens joined — equality-exact (injective join, the
    // only property the class test reads) — so for the published
    // minSpan = 50 the doubling runs ZERO rounds: one groupRank on the
    // depth-16 slice key, then the window-class test. The trade is a
    // wider range-exchange row (≈16 tokens of key vs 4) against three
    // checkpointed groupRank rounds — measured: q204 cold 5.0 → 2.5 s
    // at sf0.1 (warm 3.2 → 2.4), the 512 MB/10M-token ScaleCheck
    // sections 84 → 50 s (suffix_array) and 611 → 518 s (curate_v5);
    // the wider exchange spills where it must, the sorts stay
    // partition-local.
    val initDepth = dStop
    // non-zero window offsets: multiples of dStop whose window stays
    // inside [0, minSpan), plus the flush-right window at minSpan−dStop
    val offs = ((dStop until (minSpan - dStop + 1) by dStop) ++
      Seq(minSpan - dStop)).distinct.filter(_ > 0).map(_.toLong)
    // the round-state frame is pared to THREE columns — (gpos, ok,
    // rank) — because doc_id and pos derive back from gpos by integer
    // arithmetic (gpos = doc_id·2^20 + pos under the packed budget) and
    // the probe's length test collapses to one precomputed bit; at 64-ish
    // bytes-per-long-column per exchange row this is the difference
    // between fitting the 512 MB ScaleCheck and not, and at 100 TB it
    // is 40% off every doubling shuffle
    val pos = t
      .selectExpr("doc_id", "toks", "cast(size(toks) as bigint) AS len",
        "explode(sequence(1, size(toks))) AS pos")
      // packed budget covers pos + every lookup offset (< minSpan): the
      // key gpos+off must never spill into the next doc's space
      .withColumn("gpos",
        Dedup.guardedPacked("suffixArrayDedup", col("doc_id"),
          col("pos") + lit(minSpan.toLong), 20) - lit(minSpan.toLong))
      // positions whose depth-dStop window overruns the doc are dropped
      // BEFORE the rank: with the seed at its fixed point the doubling
      // runs zero extension rounds, so a position is consumed only as a
      // probe (needs minSpan tokens) or as a probe's window-offset
      // lookup (needs the full dStop window: max offset + dStop =
      // minSpan ≤ the probe's own remaining length) — a truncated-tail
      // position can be neither, and carrying it only widened the range
      // exchange. (The generic suffixRanks contract still keeps ALL
      // positions for real doubling rounds — this filter is valid
      // precisely because initDepth = dStop makes the loop degenerate.)
      .where(s"pos + ${dStop - 1} <= len")
      // the seed key is the md5 FINGERPRINT of the first initDepth
      // tokens joined (tokens are whitespace-free by construction, so
      // the join is injective; md5 is the repo's content-identity
      // convention — q20's exact-dedup fp and the q204 twin's own
      // window test are the same 128-bit judgement). A fixed 16-byte
      // binary is ~5× narrower in the range exchange + window sorts
      // than the raw ~16-token string (measured 2.2 → 1.4 s on the
      // registered q204 at sf0.1). Equality is all the dedup path needs
      // of its ranks (the class test never reads order); the default
      // initDepth = 1 single-token path keeps the raw token and with it
      // the lexicographic contract SuffixArraySpec pins.
      .selectExpr("gpos", s"pos + ${minSpan - 1} <= len AS ok",
        s"unhex(md5(array_join(slice(toks, cast(pos as int), $initDepth), ' '))) AS tok")
    val r = suffixRanks(pos, dStop, parts, earlyExit, initDepth)
    // the length filter MUST precede the class count (truncated shorter
    // suffixes share depth-capped ranks; it also guarantees every
    // probe's lookup target pos+off ≤ len exists, so the inner join
    // yields exactly one row per (probe, offset))
    val probe = r.where(col("ok"))
    // one exploded lookup: position q serves every probe p = q − off
    // (merge-hinted for the same reason extendRanks documents)
    val lk = r.select(col("gpos").as("lgpos"), col("rank").as("lrank"))
      .select(explode(array(offs.map(o =>
          struct(lit(o).as("off"), (col("lgpos") - lit(o)).as("gpos"))): _*)).as("x"),
        col("lrank"))
      .select(col("x.gpos").as("gpos"), col("x.off").as("off"), col("lrank"))
    val kCols = offs.indices.map(i => s"k$i")
    val aggs = offs.zipWithIndex.map { case (o, i) =>
      max(when(col("off") === lit(o), col("lrank"))).as(s"k$i") }
    val classes = probe.join(lk.hint("merge"), Seq("gpos"))
      .groupBy("gpos", "rank")
      .agg(aggs.head, aggs.tail: _*)
    val classKey = col("rank") +: kCols.map(col)
    classes
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(classKey: _*)))
      .where("cnt > 1")
      .selectExpr(s"gpos div ${1L << 20} AS doc_id",
        s"gpos % ${1L << 20} AS s",
        s"gpos % ${1L << 20} + $minSpan AS e")
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The suffix-array ExactSubstr gate over the planted long-span
    // corpus: prefix-doubled ranks, exact-depth class test (≡ the
    // adjacent-pair LCP ≥ 50 test), remove-all span cut.
    // earlyExit off: the planted 55-token copies guarantee shared
    // prefixes survive every round, so the probe could never fire
    "q204_suffix_array_dedup" -> ((s, dir) =>
      suffixArrayDedup(plantedSpanCorpus(Tables.documents(s, dir)),
        earlyExit = false)))

  /** The window-hash span-cut route as parameterized DuckDB CTEs over
    * `src` (doc_id, text): duplicated k-token windows → merged spans →
    * remove-all cut, ending in `${p}res` = (doc_id, n_tokens, n_kept,
    * txt — kept tokens joined, '' when all cut). Shared VERBATIM by the
    * q204 fingerprint twin and the q214 pipeline stage so the two
    * window-route replays can never fork. */
  private[operators] def duckSpanCut(src: String, p: String, k: Int): String =
    s"""${p}t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM $src),
       |${p}w AS (
       |  SELECT doc_id, i, md5(array_to_string(toks[i:i+${k - 1}], ' ')) AS h
       |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - ${k - 2})) AS i
       |        FROM ${p}t WHERE len(toks) >= $k)),
       |${p}sp AS (
       |  SELECT doc_id, i AS s, i + $k AS e FROM (
       |    SELECT doc_id, i, COUNT(*) OVER (PARTITION BY h) AS cnt FROM ${p}w)
       |  WHERE cnt > 1),
       |${duckSpanCutTail(p)}""".stripMargin

  /** The merge + remove-all + rebuild tail given `${p}t` (doc_id, toks)
    * and `${p}sp` (doc_id, s, e) — the span SOURCE is the caller's
    * (duplicated windows for q204/q214, eval-shingle matches for the
    * q216 scrub), the cut semantics are this ONE fragment. */
  private[operators] def duckSpanCutTail(p: String): String =
    s"""${p}m AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) THEN 1 ELSE 0 END AS newg
       |  FROM ${p}sp),
       |${p}g AS (
       |  SELECT doc_id, s, e,
       |    SUM(newg) OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM ${p}m),
       |${p}mg AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM ${p}g GROUP BY doc_id, grp),
       |${p}pos AS (
       |  SELECT doc_id, i, toks[CAST(i AS INT)] AS tok
       |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM ${p}t)),
       |${p}rm AS (
       |  SELECT DISTINCT q.doc_id, q.i FROM ${p}pos q
       |  JOIN ${p}mg ON q.doc_id = ${p}mg.doc_id AND q.i >= ${p}mg.s AND q.i < ${p}mg.e),
       |${p}kept AS (
       |  SELECT q.doc_id, q.i, q.tok FROM ${p}pos q
       |  LEFT JOIN ${p}rm ON q.doc_id = ${p}rm.doc_id AND q.i = ${p}rm.i
       |  WHERE ${p}rm.i IS NULL),
       |${p}a AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY i) AS txt
       |  FROM ${p}kept GROUP BY doc_id),
       |${p}res AS (
       |  SELECT ${p}t.doc_id, CAST(len(${p}t.toks) AS BIGINT) AS n_tokens,
       |    COALESCE(${p}a.n_kept, 0) AS n_kept, COALESCE(${p}a.txt, '') AS txt
       |  FROM ${p}t LEFT JOIN ${p}a ON ${p}a.doc_id = ${p}t.doc_id)""".stripMargin

  /** DuckDB twin: the duplicated-minSpan-window form (WHERE cnt > 1,
    * no keep-first — remove ALL occurrences), which the scaladoc's run
    * argument proves span-set-identical to the suffix-array test. The
    * twin deliberately takes the OTHER route to the same integers — a
    * window-hash group where Spark prefix-doubles a suffix array — so
    * a hash match checks the equivalence itself. */
  def oracle: Map[String, String] = Map(
    "q204_suffix_array_dedup" ->
      s"""WITH ${duckPlantCtes()},
         |${duckSpanCut("corpus", "sa", DefaultMinSpan)}
         |SELECT doc_id, n_tokens,
         |  CAST(n_tokens - n_kept AS BIGINT) AS n_removed,
         |  md5(txt) AS clean_fp
         |FROM sares ORDER BY doc_id""".stripMargin)
}
