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
  * materialized neighbors: the doubling is finished at depth EXACTLY
  * minSpan (double to d1 = the largest power of two ≤ minSpan, then one
  * composite extension keyed on (rank_d1(p), rank_d1(p + minSpan−d1)):
  * the two windows overlap and jointly cover tokens 0..minSpan−1, and
  * overlap is harmless for an EQUALITY test). Among positions with
  * ≥ minSpan tokens remaining, equal final class ⟺ equal
  * minSpan-prefix, and since equal-prefix suffixes form a contiguous
  * run in suffix order, "my class has ≥ 2 members" IS "my adjacent
  * SA neighbor has LCP ≥ minSpan" — evaluated as one count-over-class,
  * with no adjacency frame, no token-array re-join, and no slice
  * compare. (The remaining-length filter runs BEFORE the count: two
  * equally-truncated SHORTER suffixes also share a class — truncation
  * surfaces as the absent-extension rank 0 at some round, so a short
  * suffix never shares a class with a long one, but two equal 48-token
  * tails would, and marking them would be a false positive at 50.)
  *
  * Why the ranked frame holds ALL positions (not just those with ≥
  * minSpan remaining): the doubling looks ranks up at pos+2^k, and a
  * filtered frame would substitute "no suffix" (rank 0) for positions
  * that exist but fell under the filter — garbling equality classes so
  * two different prefixes could collide. Short suffixes are cheap rows;
  * they never join a long suffix's class (above) and the length filter
  * keeps them out of the span set.
  *
  * Scale shape (the 100 TB posture): rounds = log2(d1) + 2 ≤ 7 for the
  * published 50-token setting, each round exactly three shuffles of the
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
    * 50-token spans). */
  val DefaultMinSpan = 50

  /** Range-exchange partition count for the doubling rounds (grows with
    * the cluster at scale; 32 = the local shuffle width). */
  private val DefaultParts = 32

  /** The doubling loop's one materialization point per stage:
    * DISK_ONLY localCheckpoint. The loop's state frames are narrow
    * (≤5 longs) but corpus-POSITION-sized and live for several rounds;
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
    * token AT pos); every other column rides through untouched. Output:
    * the input columns minus `tok`, plus `rank`, where `rank` orders
    * suffixes lexicographically by their first `maxDepth` tokens (a
    * shorter suffix sorts before a longer one sharing its prefix — the
    * absent-extension rank 0), equal ranks ⟺ equal capped prefixes.
    * Stops early when ranks go all-distinct (full lex order reached).
    * SuffixArraySpec pins rank order ≡ a sequential suffix sort. */
  private[graft] def suffixRanks(pos0: DataFrame, maxDepth: Int,
      parts: Int = DefaultParts, earlyExit: Boolean = true): DataFrame = {
    require(maxDepth >= 1)
    var p = diskCheckpoint(
      groupRank(pos0, Seq(col("tok")), "rank", parts).drop("tok"))
    var step = 1L
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
  private[graft] def plantedSpanCorpus(d: DataFrame): DataFrame = {
    val d0 = d.select("doc_id", "text")
    val off = d0.agg(max("doc_id")).first.getLong(0) + 1
    d0.unionByName(
      d0.selectExpr("doc_id", s"$sparkToks AS toks")
        .where("doc_id % 17 = 5 AND size(toks) >= 62")
        .selectExpr(s"doc_id + ${off}L AS doc_id",
          "concat('xs', cast(doc_id as string), ' ', " +
            "array_join(slice(toks, 2, 55), ' '), " +
            "' xe', cast(doc_id as string)) AS text"))
  }

  private def duckPlantCtes: String =
    """mx AS (SELECT MAX(doc_id) + 1 AS off FROM documents),
      |pl AS (
      |  -- donor id aliased `did`: DuckDB's lateral column aliases would
      |  -- otherwise bind the flank tokens to the OFFSET id and fork the
      |  -- plant from the Spark construction
      |  SELECT did + mx.off AS doc_id,
      |    'xs' || CAST(did AS VARCHAR) || ' ' ||
      |    array_to_string(toks[2:56], ' ') ||
      |    ' xe' || CAST(did AS VARCHAR) AS text
      |  FROM (SELECT doc_id AS did, regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents) CROSS JOIN mx
      |  WHERE did % 17 = 5 AND len(toks) >= 62),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM pl)""".stripMargin

  /** q204 core — the suffix-array dedup over a (doc_id, text) corpus.
    * Output matches the q152 surface: (doc_id, n_tokens, n_removed,
    * clean_fp) for EVERY input doc, with all occurrences of every
    * ≥minSpan-token duplicated span removed. */
  def suffixArrayDedup(docs: DataFrame, minSpan: Int = DefaultMinSpan,
      parts: Int = DefaultParts, earlyExit: Boolean = true): DataFrame = {
    require(minSpan >= 2)
    // double to the largest power of two ≤ minSpan, then one composite
    // extension closes the gap to EXACTLY minSpan
    val d1 = Integer.highestOneBit(minSpan)
    val gap = (minSpan - d1).toLong
    val t = docs.selectExpr("doc_id", s"$sparkToks AS toks")
    val pos = t
      .selectExpr("doc_id", "toks", "cast(size(toks) as bigint) AS len",
        "explode(sequence(1, size(toks))) AS pos")
      // packed budget covers pos + every lookup step (≤ minSpan): the
      // key gpos+step must never spill into the next doc's space
      .withColumn("gpos",
        Dedup.guardedPacked("suffixArrayDedup", col("doc_id"),
          col("pos") + lit(minSpan.toLong), 20) - lit(minSpan.toLong))
      .selectExpr("gpos", "doc_id", "pos", "len",
        "element_at(toks, cast(pos as int)) AS tok")
    val r1 = suffixRanks(pos, d1, parts, earlyExit)
    val ext = if (gap == 0L) r1.withColumn("r2", lit(0L))
              else extendRanks(r1, gap)
    // the length filter MUST precede the class count (see scaladoc)
    val spans = ext.where(col("pos") + lit(minSpan - 1) <= col("len"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("rank"), col("r2"))))
      .where("cnt > 1")
      .selectExpr("doc_id", "pos AS s", s"pos + $minSpan AS e")
    Dedup.cutSpans(t, spans)
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

  /** DuckDB twin: the duplicated-minSpan-window form (WHERE cnt > 1,
    * no keep-first — remove ALL occurrences), which the scaladoc's run
    * argument proves span-set-identical to the suffix-array test. The
    * twin deliberately takes the OTHER route to the same integers — a
    * window-hash group where Spark prefix-doubles a suffix array — so
    * a hash match checks the equivalence itself. */
  def oracle: Map[String, String] = Map(
    "q204_suffix_array_dedup" -> {
      val k = DefaultMinSpan
      s"""WITH $duckPlantCtes,
         |t AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM corpus),
         |w AS (
         |  SELECT doc_id, i, md5(array_to_string(toks[i:i+${k - 1}], ' ')) AS h
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - ${k - 2})) AS i
         |        FROM t WHERE len(toks) >= $k)),
         |sp AS (
         |  SELECT doc_id, i AS s, i + $k AS e FROM (
         |    SELECT doc_id, i, COUNT(*) OVER (PARTITION BY h) AS cnt FROM w)
         |  WHERE cnt > 1),
         |m AS (
         |  SELECT doc_id, s, e,
         |    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) THEN 1 ELSE 0 END AS newg
         |  FROM sp),
         |g AS (
         |  SELECT doc_id, s, e,
         |    SUM(newg) OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM m),
         |mg AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY doc_id, grp),
         |pos AS (
         |  SELECT doc_id, i, toks[CAST(i AS INT)] AS tok
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t)),
         |rm AS (
         |  SELECT DISTINCT p.doc_id, p.i FROM pos p
         |  JOIN mg ON p.doc_id = mg.doc_id AND p.i >= mg.s AND p.i < mg.e),
         |kept AS (
         |  SELECT p.doc_id, p.i, p.tok FROM pos p
         |  LEFT JOIN rm ON p.doc_id = rm.doc_id AND p.i = rm.i
         |  WHERE rm.i IS NULL),
         |a AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    string_agg(tok, ' ' ORDER BY i) AS txt
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  CAST(len(t.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
         |  md5(COALESCE(a.txt, '')) AS clean_fp
         |FROM t LEFT JOIN a ON t.doc_id = a.doc_id ORDER BY t.doc_id""".stripMargin
    })
}
