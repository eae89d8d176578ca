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
    * of which document lands in which training sequence. Counts
    * whitespace tokens; [[packSequencesBy]] packs by any provided
    * per-doc token count (q157 packs by the TRAINED tokenizer's). */
  def packSequences(documents: DataFrame, budget: Int = DefaultBudget,
                    shards: Int = DefaultShards): DataFrame =
    packSequencesBy(documents.selectExpr(
      "doc_id", s"cast(size($sparkToks) as bigint) AS n_toks"), budget, shards)

  /** The packing core over an externally-supplied (doc_id, n_toks)
    * frame. The budget a trainer actually consumes is measured in ITS
    * tokenizer's tokens, not whitespace words — q157 feeds the q144
    * BPE segmentation's counts here so a 2048 budget is 2048 real
    * tokens. Same plan as [[packSequences]]: one per-shard window
    * cumsum + a ≤2-row explode per doc, never a global sort. */
  def packSequencesBy(tokenCounts: DataFrame, budget: Int = DefaultBudget,
                      shards: Int = DefaultShards): DataFrame = {
    require(budget > 0 && shards > 0)
    val toks = tokenCounts.selectExpr(
      "doc_id",
      s"doc_id % $shards AS shard",
      "cast(n_toks as bigint) AS n_toks")
    val w = Window.partitionBy("shard").orderBy("doc_id")
    toks
      .withColumn("cum", sum("n_toks").over(w))
      .withColumn("strt", col("cum") - col("n_toks"))
      .where("n_toks > 0")
      .withColumn("seq_id", explode(expr(s"sequence(strt div $budget, (cum - 1) div $budget)")))
      .selectExpr("shard", "seq_id", "doc_id",
        s"least(cum, (seq_id + 1) * ${budget}L) - greatest(strt, seq_id * ${budget}L) AS seg_tokens")
  }

  /** Default shard count for [[shardManifest]]. */
  val DefaultManifestShards = 16

  /** Export-shard manifest: assign every document to one of `shards`
    * output shards by a PORTABLE hash (the q12 Knuth constants, so the
    * assignment is reproducible across engines and cluster sizes —
    * sequential ids decorrelate instead of clumping as `id % S` would),
    * and emit one self-describing manifest row per shard: doc count,
    * total whitespace tokens, an order-independent content checksum
    * (`bit_xor` of each doc's 48-bit text hash — XOR neither overflows
    * under ANSI arithmetic at any corpus size nor depends on shuffle
    * order; the price is that a duplicated PAIR of identical docs
    * cancels, which exact dedup upstream (q20) already rules out), and
    * the id range. This is the handoff artifact a training loader
    * checks shard integrity against without rescanning the data.
    *
    * Plan: one scan, expression-only map, ONE hash aggregate keyed by
    * shard with map-side partial aggregation — the shuffle carries S
    * partial rows per input partition, never documents. At 100 TB the
    * data itself ships via `repartition(S, shard)` + partitioned write;
    * the manifest is this same aggregate reusing that exchange. */
  def shardManifest(documents: DataFrame,
                    shards: Int = DefaultManifestShards): DataFrame = {
    require(shards > 0)
    documents.selectExpr(
      "doc_id",
      // (doc_id mod P) * A + B stays < 2^63 for any long id (ANSI-safe)
      s"pmod((doc_id % 1000000007) * 2654435761 + 40503, $shards) AS shard",
      s"cast(size($sparkToks) as bigint) AS n_toks",
      s"${sparkHash48("text")} AS h")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        expr("bit_xor(h)").cast("long").as("checksum"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
  }

  /** q205 — the q182 mixture schedule MATERIALIZED: which packed
    * training sequence lands at every schedule position, the positions
    * cut into `outShards` contiguous blocks (so reading shards 0..N−1
    * in order, each ordered by `pos`, replays the schedule exactly —
    * the layout [[graft.sources.v2.GraftWrite]]'s declared
    * range-distribution-and-ordering lands on disk when the draws are
    * written with `pos` as the shard key; ScheduleShardSpec does that
    * write and reads the stream back segment by segment), plus the
    * per-shard MANIFEST this query registers: draw counts, source
    * coverage, token mass, the md5 of the position-ordered draw stream,
    * and the position range.
    *
    * Composition (the three pieces the round-16 verdict asked to close
    * the loop on): q182's WRR positions say WHEN source s is drawn;
    * q157's packing (here keyed per (source, doc_id%subShards) so the
    * cumsum window stays subshard-LOCAL — a per-source window would be
    * corpus-sized at web scale, the q191 lesson) says WHAT a draw of
    * source s contains; occurrence j consumes the source's sequences
    * CYCLICALLY (seq_ix = (j−1) mod n_seqs — the epoch-wrapping a real
    * loader does when a source's quota outruns its data). The global
    * per-source sequence index is ARITHMETIC: subshard-local seq_id +
    * the exclusive sum of lower subshards' counts, computed on the
    * (#sources × subShards)-row count frame — windows run over THAT
    * bounded frame only, never the sequence table.
    *
    * Scale shape: one corpus scan → subshard-local packing windows →
    * a sequence-table join against the BUDGET-sized draw frame
    * (broadcast — the schedule is 10k rows by construction at any
    * corpus size); the manifest aggregate collects ≤ budget/outShards
    * ordered draws per shard (array_sort over a bounded list — the
    * q196 ≤40-row class, sized by the mix table, not the corpus). */
  def scheduleShards(docs: DataFrame, budget: Long = 10000L,
      seqBudget: Int = DefaultBudget, subShards: Int = 8,
      outShards: Int = 8): DataFrame =
    scheduleDraws(docs, budget, seqBudget, subShards, outShards)
      .groupBy("shard")
      .agg(count(lit(1)).cast("long").as("n_draws"),
        countDistinct("source").cast("long").as("n_sources"),
        sum("seq_tokens").cast("long").as("n_tokens"),
        expr("md5(array_join(transform(array_sort(collect_list(" +
          "struct(pos, concat(source, ':', cast(seq_ix as string))))), " +
          "x -> x.col2), '|'))").as("stream_md5"),
        min("pos").as("min_pos"), max("pos").as("max_pos"))
      .orderBy("shard")

  /** The position-ordered draw frame behind [[scheduleShards]] — what
    * ScheduleShardSpec writes through the DSv2 sharded sink (shard key
    * `pos`) to land the training corpus as range segments in schedule
    * order. Columns: (pos, shard, source, seq_ix, seq_tokens). */
  private[graft] def scheduleDraws(docs: DataFrame, budget: Long = 10000L,
      seqBudget: Int = DefaultBudget, subShards: Int = 8,
      outShards: Int = 8): DataFrame = {
    require(budget > 0 && seqBudget > 0 && subShards > 0 && outShards > 0)
    // ONE corpus tokenize serves both consumers: the packing chain below
    // and the schedule's per-source mass (previously a second full
    // tokenize inside temperatureMixture). Materialized as the narrow
    // (source, doc_id, ss, n_toks) manifest — four columns at any scale.
    // The mass aggregates the UNFILTERED frame so a hypothetical
    // all-zero-token source keeps its 0-mass row exactly as
    // temperatureMixture(docs) would produce it.
    val toksAll = docs.selectExpr("source", "doc_id",
        s"doc_id % $subShards AS ss",
        s"cast(size($sparkToks) as bigint) AS n_toks")
      .localCheckpoint()
    val toks = toksAll.where("n_toks > 0")
    val w = Window.partitionBy("source", "ss").orderBy("doc_id")
    val seqs = toks
      .withColumn("cum", sum("n_toks").over(w))
      .withColumn("strt", col("cum") - col("n_toks"))
      .withColumn("seq_id",
        explode(expr(s"sequence(strt div $seqBudget, (cum - 1) div $seqBudget)")))
      .selectExpr("source", "ss", "seq_id",
        s"least(cum, (seq_id + 1) * ${seqBudget}L) - greatest(strt, seq_id * ${seqBudget}L) AS seg_tokens")
      .groupBy("source", "ss", "seq_id")
      .agg(sum("seg_tokens").cast("long").as("seq_tokens"))
    val cnts = seqs.groupBy("source", "ss").agg(count(lit(1)).as("m"))
    val offs = cnts
      .withColumn("off", coalesce(sum("m").over(
        Window.partitionBy("source").orderBy("ss")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_seqs", sum("m").over(Window.partitionBy("source")))
    val indexed = seqs
      .join(broadcast(offs.select("source", "ss", "off")), Seq("source", "ss"))
      .selectExpr("source", "off + seq_id AS seq_ix", "seq_tokens")
    val nseq = offs.groupBy("source").agg(max("n_seqs").as("n_seqs"))
    // LEFT join + in-plan raise_error, not an inner join: a scheduled
    // source with ZERO packable sequences (every doc zero-token) would
    // silently drop its schedule positions from the materialized stream
    // — and the DuckDB twin, built the same way, could never catch the
    // missing positions. The guard keeps the draw frame at exactly
    // `budget` rows or fails loudly naming the starved source.
    val draws = Curation.mixScheduleOver(
        toksAll.groupBy("source").agg(sum("n_toks").as("n_tokens")), budget)
      .join(broadcast(nseq), Seq("source"), "left")
      .withColumn("seq_ix", expr(
        "IF(n_seqs IS NULL, cast(raise_error(concat(" +
          "'scheduleDraws: scheduled source has no packable sequences " +
          "(all docs zero-token): ', source)) as bigint), (j - 1) % n_seqs)"))
      .select("pos", "source", "seq_ix")
    broadcast(draws).join(indexed, Seq("source", "seq_ix"))
      .withColumn("shard", expr(s"((pos - 1) * $outShards) div ${budget}L"))
      .select("pos", "shard", "source", "seq_ix", "seq_tokens")
  }

  /** q218 — GREEDY PAIR PACKING ("packing depth 2", the form Krell et
    * al. 2021 report recovers most of the padding waste on real length
    * distributions): per shard, each doc (len = min(tokens, budget) —
    * truncation documented, an over-long doc rides alone) lands in a
    * bin of at most TWO docs, paired by the classic two-pointer greedy
    * over the sorted multiset (largest with the smallest that still
    * fits) — which is provably OPTIMAL for ≤2-per-bin bin counts (the
    * "minimum boats" argument; Pack2Spec checks it against brute-force
    * minimum matchings). Contrast with q56/q157: those SPLIT documents
    * across sequence boundaries (maximum fill, cross-doc contamination);
    * pack-2 keeps docs whole and reports the padding price — the
    * trade-off table a training-loader decision actually reads.
    *
    * Scale shape — the whole point of the HISTOGRAM simulation: the
    * corpus contributes one distributed groupBy (shard, len) count;
    * the greedy then runs as an in-row integer fold over the ≤budget
    * histogram SLOTS of each shard (state = two pointers + two
    * remaining counts + two tallies; batch-pairing min(ci, cj)
    * identical docs at once is exact because slot members are
    * indistinguishable), so the sequential part is model-state-sized —
    * bounded by `budget`, NOT by the corpus — and both engines replay
    * the identical integer recurrence (Spark in-row `aggregate`,
    * DuckDB `list_reduce`). Output: per-shard bin/pair/solo counts,
    * waste, and fill — #shards rows. */
  def pack2Bins(docs: DataFrame, budget: Int = DefaultBudget,
                shards: Int = DefaultShards): DataFrame =
    pack2BinsBy(docs.selectExpr(
      "doc_id", s"cast(size($sparkToks) as bigint) AS n_toks"), budget, shards)

  /** The pack-2 core over an externally-supplied (doc_id, n_toks)
    * frame — q219 feeds the trained-BPE counts here so the 2048 budget
    * is 2048 REAL tokens (the q56↔q157 convention applied to the
    * pair packer). */
  def pack2BinsBy(tokenCounts: DataFrame, budget: Int = DefaultBudget,
                  shards: Int = DefaultShards): DataFrame = {
    require(budget > 0 && shards > 0)
    // zero-token docs are excluded, matching q56/q157's packer: an
    // empty doc is not a bin member and must not distort n_bins/waste/
    // fill (no registered twin can feed one — whitespace split yields
    // ≥1 token and the BPE count join drops token-less docs — so this
    // is API hardening for external callers; the twins' hist carries
    // the mirrored l > 0 filter)
    val hist = tokenCounts
      .where("n_toks > 0")
      .selectExpr(s"doc_id % $shards AS shard",
        s"least(cast(n_toks as bigint), ${budget}L) AS len")
      .groupBy("shard", "len").agg(count(lit(1)).as("c"))
      .groupBy("shard")
      .agg(expr("sort_array(collect_list(struct(len, c))) AS h"),
        sum(expr("len * c")).cast("long").as("n_tokens"),
        sum("c").cast("long").as("n_docs"))
      .selectExpr("shard", "n_docs", "n_tokens",
        "transform(h, x -> x.len) AS ls", "transform(h, x -> x.c) AS cs",
        "size(h) AS m")
    // two-pointer state: (i, j) slot indices, (ci, cj) remaining counts
    // at the pointers, p pairs, s solos. Each non-noop step advances a
    // pointer, so 2·m steps always suffice; when the pointers MEET the
    // true remaining count is least(ci, cj) (whichever pointer arrived
    // last holds the slot's full count, the resident one the remainder).
    val init = "named_struct('i', 1, 'j', m, " +
      "'ci', element_at(cs, 1), 'cj', element_at(cs, m), 'p', 0L, 's', 0L)"
    val step =
      s"""CASE
         | WHEN acc.i > acc.j THEN acc
         | WHEN acc.i = acc.j THEN named_struct(
         |   'i', acc.j + 1, 'j', acc.j, 'ci', 0L, 'cj', 0L,
         |   'p', acc.p + IF(2 * element_at(ls, acc.i) <= $budget,
         |     least(acc.ci, acc.cj) div 2, 0L),
         |   's', acc.s + IF(2 * element_at(ls, acc.i) <= $budget,
         |     least(acc.ci, acc.cj) % 2, least(acc.ci, acc.cj)))
         | WHEN element_at(ls, acc.i) + element_at(ls, acc.j) <= $budget
         |   THEN named_struct(
         |   'i', IF(acc.ci = least(acc.ci, acc.cj), acc.i + 1, acc.i),
         |   'j', IF(acc.cj = least(acc.ci, acc.cj), acc.j - 1, acc.j),
         |   'ci', IF(acc.ci = least(acc.ci, acc.cj),
         |     element_at(cs, acc.i + 1), acc.ci - least(acc.ci, acc.cj)),
         |   'cj', IF(acc.cj = least(acc.ci, acc.cj),
         |     element_at(cs, acc.j - 1), acc.cj - least(acc.ci, acc.cj)),
         |   'p', acc.p + least(acc.ci, acc.cj), 's', acc.s)
         | ELSE named_struct('i', acc.i, 'j', acc.j - 1, 'ci', acc.ci,
         |   'cj', element_at(cs, acc.j - 1), 'p', acc.p, 's', acc.s + acc.cj)
         |END""".stripMargin
    hist
      .withColumn("st", expr(s"aggregate(sequence(1, 2 * m), $init, (acc, z) -> $step)"))
      .selectExpr("shard", "n_docs", "n_tokens",
        "st.p AS n_pairs", "st.s AS n_solo", "st.p + st.s AS n_bins",
        s"(st.p + st.s) * ${budget}L - n_tokens AS waste",
        s"IF(st.p + st.s = 0, 0L, (10000L * n_tokens) div ((st.p + st.s) * ${budget}L)) AS fill_e4")
      .orderBy("shard")
  }

  /** q223 — the pack-2 assignment MATERIALIZED: which doc shares a bin
    * with which (the loader-facing surface q56/q205 provide for the
    * splitting packer, now for the pair packer whose q218/q219 gates
    * prove only the optimal COUNT). Docs are ranked within (shard, len)
    * by doc_id — slot members are indistinguishable to the greedy, so
    * any deterministic rank yields AN optimal assignment; this one is
    * replayed identically by the twin. The histogram fold re-runs with
    * an EVENT LOG: each step emits its consumed rank ranges (pair: the
    * low slot's next t ranks ascending zipped with the high slot's top
    * t remaining ranks descending; solo: the high slot's remaining
    * ranks; meet: the surviving range of the meeting slot, paired
    * consecutively). Events per shard are ≤ 2·slots + 1 —
    * budget-bounded, NEVER corpus-bounded — so the event frame
    * broadcasts and docs join it by (shard, len) equality + a rank
    * BETWEEN filter; bin_id = MIN(doc_id) over the ≤2-doc group, so the
    * id is content-derived (no cross-engine numbering to align).
    * Output: (shard, bin_id, doc_id, len) — every POSITIVE-token input
    * doc exactly once (zero/negative-token docs are excluded up front,
    * the q56/q157 packer convention: they occupy no loader capacity
    * and would otherwise manufacture empty bins); Pack2Spec pins
    * conservation over the filtered set, per-bin budget, and bin-count/
    * waste equality against q218's histogram verdict. */
  def pack2Assign(docs: DataFrame, budget: Int = DefaultBudget,
                  shards: Int = DefaultShards): DataFrame =
    pack2AssignBy(docs.selectExpr(
      "doc_id", s"cast(size($sparkToks) as bigint) AS n_toks"), budget, shards)

  def pack2AssignBy(tokenCounts: DataFrame, budget: Int = DefaultBudget,
                    shards: Int = DefaultShards): DataFrame = {
    require(budget > 0 && shards > 0)
    val lens = tokenCounts.where("n_toks > 0")
      .selectExpr("doc_id", s"doc_id % $shards AS shard",
        s"least(cast(n_toks as bigint), ${budget}L) AS len")
    val ranked = lens.withColumn("r", row_number().over(
      Window.partitionBy("shard", "len").orderBy("doc_id")).cast("long"))
    val hist = lens.groupBy("shard", "len").agg(count(lit(1)).as("c"))
      .groupBy("shard")
      .agg(expr("sort_array(collect_list(struct(len, c))) AS h"))
      .selectExpr("shard",
        "transform(h, x -> x.len) AS ls", "transform(h, x -> x.c) AS cs",
        "size(h) AS m")
    // the q218 two-pointer recurrence with an event log in the state:
    // same branches, same pointer moves — Pack2Spec pins the bin count
    // and waste of the reconstructed assignment against pack2BinsBy, so
    // the two spellings cannot drift
    val evZero = "array_repeat(named_struct('k', 0, 'ei', 0, 'ej', 0, " +
      "'ilen', 0L, 'ilo', 0L, 'jlen', 0L, 'jlo', 0L, 't', 0L, 'pb', false), 0)"
    val init = "named_struct('i', 1, 'j', m, " +
      s"'ci', element_at(cs, 1), 'cj', element_at(cs, m), 'ev', $evZero)"
    val step =
      s"""CASE
         | WHEN acc.i > acc.j THEN acc
         | WHEN acc.i = acc.j THEN named_struct(
         |   'i', acc.j + 1, 'j', acc.j, 'ci', 0L, 'cj', 0L,
         |   'ev', concat(acc.ev, array(named_struct('k', 3, 'ei', acc.i, 'ej', acc.j,
         |     'ilen', element_at(ls, acc.i),
         |     'ilo', IF(acc.ci <= acc.cj, element_at(cs, acc.i) - acc.ci + 1L, 1L),
         |     'jlen', 0L, 'jlo', 0L, 't', least(acc.ci, acc.cj),
         |     'pb', 2 * element_at(ls, acc.i) <= $budget))))
         | WHEN element_at(ls, acc.i) + element_at(ls, acc.j) <= $budget
         |   THEN named_struct(
         |   'i', IF(acc.ci = least(acc.ci, acc.cj), acc.i + 1, acc.i),
         |   'j', IF(acc.cj = least(acc.ci, acc.cj), acc.j - 1, acc.j),
         |   'ci', IF(acc.ci = least(acc.ci, acc.cj),
         |     element_at(cs, acc.i + 1), acc.ci - least(acc.ci, acc.cj)),
         |   'cj', IF(acc.cj = least(acc.ci, acc.cj),
         |     element_at(cs, acc.j - 1), acc.cj - least(acc.ci, acc.cj)),
         |   'ev', concat(acc.ev, array(named_struct('k', 1, 'ei', acc.i, 'ej', acc.j,
         |     'ilen', element_at(ls, acc.i), 'ilo', element_at(cs, acc.i) - acc.ci + 1L,
         |     'jlen', element_at(ls, acc.j), 'jlo', acc.cj - least(acc.ci, acc.cj) + 1L,
         |     't', least(acc.ci, acc.cj), 'pb', true))))
         | ELSE named_struct('i', acc.i, 'j', acc.j - 1, 'ci', acc.ci,
         |   'cj', element_at(cs, acc.j - 1),
         |   'ev', concat(acc.ev, array(named_struct('k', 2, 'ei', acc.i, 'ej', acc.j,
         |     'ilen', 0L, 'ilo', 0L, 'jlen', element_at(ls, acc.j), 'jlo', 1L,
         |     't', acc.cj, 'pb', false))))
         |END""".stripMargin
    val sides = hist
      .withColumn("st", expr(s"aggregate(sequence(1, 2 * m), $init, (acc, z) -> $step)"))
      .selectExpr("shard", "explode(st.ev) AS e")
      .selectExpr("shard", "e.k AS k", "e.ei AS ei", "e.ej AS ej", "e.pb AS pb",
        """explode(CASE
          | WHEN e.k = 1 THEN array(
          |   named_struct('side', 0, 'len', e.ilen, 'rlo', e.ilo, 'rhi', e.ilo + e.t - 1),
          |   named_struct('side', 1, 'len', e.jlen, 'rlo', e.jlo, 'rhi', e.jlo + e.t - 1))
          | WHEN e.k = 2 THEN array(
          |   named_struct('side', 1, 'len', e.jlen, 'rlo', 1L, 'rhi', e.t))
          | ELSE array(
          |   named_struct('side', 0, 'len', e.ilen, 'rlo', e.ilo, 'rhi', e.ilo + e.t - 1))
          |END) AS sd""".stripMargin)
      .selectExpr("shard", "k", "ei", "ej", "pb", "sd.side AS side",
        "sd.len AS len", "sd.rlo AS rlo", "sd.rhi AS rhi")
    ranked.alias("d")
      .join(broadcast(sides.alias("s")),
        expr("d.shard = s.shard AND d.len = s.len AND d.r BETWEEN s.rlo AND s.rhi"))
      .selectExpr("d.shard AS shard", "d.doc_id AS doc_id", "d.len AS len",
        "s.ei AS ei", "s.ej AS ej",
        """CASE WHEN s.k = 1 THEN IF(s.side = 0, d.r - s.rlo + 1, s.rhi - d.r + 1)
          |     WHEN s.k = 2 THEN d.r
          |     ELSE IF(s.pb, (d.r - s.rlo) div 2, d.r) END AS g""".stripMargin)
      .withColumn("bin_id", min("doc_id").over(
        Window.partitionBy("shard", "ei", "ej", "g")))
      .select("shard", "bin_id", "doc_id", "len")
      .orderBy("shard", "bin_id", "doc_id")
  }

  /** Merge shard manifests: counts and token totals ADD, checksums XOR,
    * id ranges combine — every [[shardManifest]] column is a
    * commutative monoid, so the manifest of (corpus ∪ batch) equals
    * merge(manifest(corpus), manifest(batch)). That algebra is the
    * 100 TB maintenance story: an append updates the manifest from the
    * BATCH's manifest alone (the q122 IVM argument, applied to the
    * export artifact), never by rescanning the corpus. Cost: the
    * inputs are shard-count-sized — this is driver-trivial by design. */
  def mergeManifests(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("shard")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        expr("bit_xor(checksum)").cast("long").as("checksum"),
        min("min_id").as("min_id"), max("max_id").as("max_id"))

  /** Number of shuffle shards for [[epochShuffle]]. */
  val DefaultEpochShards = 8

  /** Deterministic per-epoch training order: every epoch re-shuffles the
    * corpus by a PORTABLE hash of (doc_id, epoch) — the standard
    * seeded-reshuffle a training loader needs (same data, different
    * order each epoch, reproducible across engines and cluster sizes
    * with no RNG state). Each doc lands in shard = hash % S and takes
    * position = rank of its hash WITHIN that shard.
    *
    * Scale shape: ordering is assigned per (epoch, shard), never
    * globally — the row_number window partitions by (epoch, shard), so
    * the largest sort is corpus/S and grows shards with the corpus
    * (a global contiguous position would need a single-partition window
    * or a zipWithIndex second pass; loaders consume shard files, so
    * within-shard order IS the artifact). One explode (cheap, ×epochs)
    * + one window shuffle. */
  def epochShuffle(documents: DataFrame, epochs: Int = 2,
                   shards: Int = DefaultEpochShards): DataFrame = {
    require(epochs > 0 && shards > 0)
    val keyed = documents
      .selectExpr("doc_id",
        s"explode(sequence(0, ${epochs - 1})) AS epoch")
      .selectExpr("cast(epoch as bigint) AS epoch", "doc_id",
        s"${sparkHash48("concat(cast(doc_id as string), ':', cast(epoch as string))")} AS okey")
      .withColumn("shard", pmod(col("okey"), lit(shards.toLong)))
    keyed.withColumn("pos",
        row_number().over(Window.partitionBy("epoch", "shard")
          .orderBy("okey", "doc_id")).cast("long"))
      .select("epoch", "shard", "pos", "doc_id", "okey")
  }

  // ---------------------------------------------------------------- query

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-epoch deterministic reshuffle: the oracle recomputes the same
    // portable-hash order, so the hash match pins both the assignment
    // AND the within-shard sequence for every epoch.
    "q140_epoch_shuffle" -> ((s, dir) =>
      epochShuffle(Tables.documents(s, dir))
        .orderBy("epoch", "shard", "pos")),

    "q56_seq_packing" -> ((s, dir) =>
      packSequences(Tables.documents(s, dir))
        .orderBy("shard", "seq_id", "doc_id")),

    // Tokenizer-aware packing: the q56 plan, but budgeted in the q144
    // trained-BPE segmentation's tokens (shared memoized training run)
    // — the count a training loader's 2048 window actually holds.
    "q157_bpe_packing" -> ((s, dir) =>
      packSequencesBy(Bpe.tokenCountsMemo(s, dir)
          .selectExpr("doc_id", "n_bpe_tokens AS n_toks"))
        .orderBy("shard", "seq_id", "doc_id")),

    // Greedy pair packing (packing depth 2): whole docs, ≤2 per bin,
    // optimal bin count by the histogram two-pointer — the
    // no-cross-doc-contamination alternative beside q56's splitter
    "q218_pack2_bins" -> ((s, dir) =>
      pack2Bins(Tables.documents(s, dir))),

    // the same pair packer denominated in the TRAINED tokenizer's
    // tokens (the q56↔q157 convention: a 2048 budget is 2048 real
    // tokens; shared memoized training run)
    "q219_pack2_bpe" -> ((s, dir) =>
      pack2BinsBy(Bpe.tokenCountsMemo(s, dir)
        .selectExpr("doc_id", "n_bpe_tokens AS n_toks"))),

    // the pair packing MATERIALIZED — (shard, bin_id, doc_id, len),
    // bin_id = min doc_id in the bin, reconstructed by replaying the
    // q218 two-pointer over docs ranked within (shard, len) by doc_id
    "q223_pack2_assign" -> ((s, dir) =>
      pack2Assign(Tables.documents(s, dir))),

    // the assignment in TRAINED-tokenizer tokens (the q218↔q219
    // denomination convention applied to q223: the pairing a loader
    // actually materializes packs 2048 REAL tokens per bin)
    "q226_pack2_assign_bpe" -> ((s, dir) =>
      pack2AssignBy(Bpe.tokenCountsMemo(s, dir)
        .selectExpr("doc_id", "n_bpe_tokens AS n_toks"))),

    "q124_shard_manifest" -> ((s, dir) =>
      shardManifest(Tables.documents(s, dir)).orderBy("shard")),

    // The q182 schedule materialized into contiguous-position shards,
    // manifest per shard (draws, sources, tokens, ordered-stream md5).
    "q205_schedule_shards" -> ((s, dir) =>
      scheduleShards(Tables.documents(s, dir))),

    // Incremental manifest maintenance: the corpus is split into an
    // existing part and an appended batch, each manifested
    // INDEPENDENTLY, then merged — the oracle is the q124 whole-corpus
    // manifest, so the hash match proves merge(manifest(a),
    // manifest(b)) ≡ manifest(a ∪ b) exactly (counts, tokens, XOR
    // checksum, and id ranges all survive the split).
    "q132_manifest_merge" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      mergeManifests(
        shardManifest(docs.where("doc_id % 5 <> 2")),
        shardManifest(docs.where("doc_id % 5 = 2")))
        .orderBy("shard")
    })
  )

  /** The pack-2 recursion as DuckDB CTEs given a `lens` (shard, l)
    * source — shared verbatim by the whitespace (q218) and
    * BPE-denominated (q219) twins. The state walks ONE row per shard
    * per step (the q180 recursive-walk discipline; deliberately NOT
    * list_reduce — DuckDB 1.0 mis-evaluates a struct-CASE lambda that
    * both reads and rebuilds its accumulator, traced during q218's
    * bring-up: one step advanced the pair count twice). */
  private def duckPack2Tail: String = {
    val C = DefaultBudget
    s"""$duckPack2StateCtes
       |SELECT hs.shard, hs.n_docs, hs.n_tokens,
       |  st.p AS n_pairs, st.s AS n_solo, st.p + st.s AS n_bins,
       |  (st.p + st.s) * $C - hs.n_tokens AS waste,
       |  CASE WHEN st.p + st.s = 0 THEN 0
       |    ELSE (10000 * hs.n_tokens) // ((st.p + st.s) * $C) END AS fill_e4
       |FROM st JOIN hs ON hs.shard = st.shard
       |WHERE st.i > st.j
       |ORDER BY hs.shard""".stripMargin
  }

  /** The pack-2 histogram + two-pointer state recursion (hist/hs/st)
    * shared by the count twins (q218/q219, [[duckPack2Tail]]) and the
    * assignment twin (q223, [[duckPack2AssignTail]] — which reads the
    * FULL state trace, every intermediate row of the recursive CTE,
    * not just the terminal state). */
  private def duckPack2StateCtes: String = {
    val C = DefaultBudget
    val pair = s"hs.ls[st.i] + hs.ls[st.j] <= $C"
    val t = "least(st.ci, st.cj)"
    s"""hist AS (
       |  SELECT shard, l, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM lens WHERE l > 0 GROUP BY shard, l),
       |hs AS (
       |  SELECT shard, list(l ORDER BY l) AS ls, list(c ORDER BY l) AS cs,
       |    CAST(COUNT(*) AS INT) AS m,
       |    CAST(SUM(l * c) AS BIGINT) AS n_tokens,
       |    CAST(SUM(c) AS BIGINT) AS n_docs
       |  FROM hist GROUP BY shard),
       |st AS (
       |  SELECT shard, 1 AS i, m AS j, cs[1] AS ci, cs[m] AS cj,
       |    CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS s
       |  FROM hs
       |  UNION ALL
       |  SELECT st.shard,
       |    CASE WHEN st.i = st.j THEN st.j + 1
       |         WHEN $pair AND st.ci = $t THEN st.i + 1 ELSE st.i END,
       |    CASE WHEN st.i = st.j THEN st.j
       |         WHEN $pair AND st.cj = $t THEN st.j - 1
       |         WHEN NOT ($pair) THEN st.j - 1 ELSE st.j END,
       |    CASE WHEN st.i = st.j THEN CAST(0 AS BIGINT)
       |         WHEN $pair THEN (CASE WHEN st.ci = $t THEN hs.cs[st.i + 1]
       |                               ELSE st.ci - $t END)
       |         ELSE st.ci END,
       |    CASE WHEN st.i = st.j THEN CAST(0 AS BIGINT)
       |         WHEN $pair THEN (CASE WHEN st.cj = $t THEN hs.cs[st.j - 1]
       |                               ELSE st.cj - $t END)
       |         ELSE hs.cs[st.j - 1] END,
       |    CASE WHEN st.i = st.j THEN st.p +
       |           (CASE WHEN 2 * hs.ls[st.i] <= $C THEN $t // 2 ELSE 0 END)
       |         WHEN $pair THEN st.p + $t ELSE st.p END,
       |    CASE WHEN st.i = st.j THEN st.s +
       |           (CASE WHEN 2 * hs.ls[st.i] <= $C THEN $t % 2 ELSE $t END)
       |         WHEN $pair THEN st.s ELSE st.s + st.cj END
       |  FROM st JOIN hs ON hs.shard = st.shard
       |  WHERE st.i <= st.j)""".stripMargin
  }

  /** q223's twin tail: events off the full state TRACE (each
    * non-terminal state row emits its outgoing transition's consumed
    * rank ranges — (i, j) never repeats along a chain, so the pointer
    * pair is the event key), sides unioned per kind, docs ranked within
    * (shard, len) by doc_id joined by rank range, bin = MIN(doc_id)
    * over the ≤2-doc group — the exact reconstruction
    * [[pack2AssignBy]] runs, on the other engine's route. */
  private def duckPack2AssignTail: String = {
    val C = DefaultBudget
    s"""$duckPack2StateCtes,
       |ev AS (
       |  SELECT st.shard, st.i AS ei, st.j AS ej,
       |    CASE WHEN st.i = st.j THEN 3
       |         WHEN hs.ls[st.i] + hs.ls[st.j] <= $C THEN 1 ELSE 2 END AS k,
       |    hs.ls[st.i] AS ilen,
       |    CASE WHEN st.i = st.j AND st.ci > st.cj THEN CAST(1 AS BIGINT)
       |         ELSE hs.cs[st.i] - st.ci + 1 END AS ilo,
       |    hs.ls[st.j] AS jlen,
       |    st.cj - least(st.ci, st.cj) + 1 AS jlo,
       |    CASE WHEN st.i = st.j OR hs.ls[st.i] + hs.ls[st.j] <= $C
       |         THEN least(st.ci, st.cj) ELSE st.cj END AS t,
       |    2 * hs.ls[st.i] <= $C AS pb
       |  FROM st JOIN hs ON hs.shard = st.shard
       |  WHERE st.i <= st.j),
       |sides AS (
       |  SELECT shard, k, ei, ej, pb, 0 AS side, ilen AS len, ilo AS rlo, ilo + t - 1 AS rhi
       |  FROM ev WHERE k IN (1, 3)
       |  UNION ALL
       |  SELECT shard, k, ei, ej, pb, 1, jlen, jlo, jlo + t - 1 FROM ev WHERE k = 1
       |  UNION ALL
       |  SELECT shard, k, ei, ej, pb, 1, jlen, CAST(1 AS BIGINT), t FROM ev WHERE k = 2),
       |rankd AS (
       |  SELECT doc_id, shard, l AS len,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY shard, l ORDER BY doc_id) AS BIGINT) AS r
       |  FROM lens WHERE l > 0),
       |grpd AS (
       |  SELECT d.shard, d.doc_id, d.len, s.ei, s.ej,
       |    CASE WHEN s.k = 1 THEN (CASE WHEN s.side = 0 THEN d.r - s.rlo + 1 ELSE s.rhi - d.r + 1 END)
       |         WHEN s.k = 2 THEN d.r
       |         ELSE (CASE WHEN s.pb THEN (d.r - s.rlo) // 2 ELSE d.r END) END AS g
       |  FROM rankd d JOIN sides s
       |    ON s.shard = d.shard AND s.len = d.len AND d.r BETWEEN s.rlo AND s.rhi)
       |SELECT shard, MIN(doc_id) OVER (PARTITION BY shard, ei, ej, g) AS bin_id,
       |  doc_id, len
       |FROM grpd ORDER BY shard, bin_id, doc_id""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    // the q182 schedule chain (shared fragment — the twin can't fork
    // from q182's own) + per-(source, subshard) packing + cyclic draw
    // assignment + contiguous shard blocks + the ordered-stream digest
    "q205_schedule_shards" ->
      s"""WITH ${Curation.duckScheduleCtes},
         |ptk AS (
         |  SELECT source, doc_id, doc_id % 8 AS ss,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_toks
         |  FROM documents),
         |pw AS (
         |  SELECT source, doc_id, ss, n_toks,
         |    CAST(SUM(n_toks) OVER (PARTITION BY source, ss ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM ptk WHERE n_toks > 0),
         |psg AS (
         |  SELECT source, ss, strt, cum,
         |    unnest(range(strt // $DefaultBudget, (cum - 1) // $DefaultBudget + 1)) AS seq_id
         |  FROM (SELECT *, cum - n_toks AS strt FROM pw)),
         |pseq AS (
         |  SELECT source, ss, seq_id,
         |    CAST(SUM(least(cum, (seq_id + 1) * $DefaultBudget) -
         |             greatest(strt, seq_id * $DefaultBudget)) AS BIGINT) AS seq_tokens
         |  FROM psg GROUP BY 1, 2, 3),
         |pcnt AS (SELECT source, ss, COUNT(*) AS m FROM pseq GROUP BY 1, 2),
         |poff AS (
         |  SELECT source, ss,
         |    COALESCE(SUM(m) OVER (PARTITION BY source ORDER BY ss
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM pcnt),
         |pidx AS (
         |  SELECT s.source, o.off + s.seq_id AS seq_ix, s.seq_tokens
         |  FROM pseq s JOIN poff o ON s.source = o.source AND s.ss = o.ss),
         |pns AS (SELECT source, COUNT(*) AS n_seqs FROM pseq GROUP BY 1),
         |draws AS (
         |  SELECT sched.pos, sched.source, ((sched.j - 1) % pns.n_seqs) AS seq_ix
         |  FROM sched JOIN pns ON sched.source = pns.source),
         |dd AS (
         |  SELECT d.pos, d.source, d.seq_ix, x.seq_tokens,
         |    ((d.pos - 1) * 8) // 10000 AS shard
         |  FROM draws d JOIN pidx x ON d.source = x.source AND d.seq_ix = x.seq_ix)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_draws,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(SUM(seq_tokens) AS BIGINT) AS n_tokens,
         |  md5(string_agg(source || ':' || CAST(seq_ix AS VARCHAR), '|' ORDER BY pos)) AS stream_md5,
         |  CAST(MIN(pos) AS BIGINT) AS min_pos, CAST(MAX(pos) AS BIGINT) AS max_pos
         |FROM dd GROUP BY shard ORDER BY shard""".stripMargin,

    "q140_epoch_shuffle" ->
      s"""WITH k AS (
         |  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
         |    ${duckHash48("concat(CAST(doc_id AS VARCHAR), ':', CAST(epoch AS VARCHAR))")} AS okey
         |  FROM documents, (SELECT unnest(range(2)) AS epoch)),
         |s AS (SELECT epoch, doc_id, okey, okey % $DefaultEpochShards AS shard FROM k)
         |SELECT epoch, shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY okey, doc_id) AS BIGINT) AS pos,
         |  doc_id, okey
         |FROM s ORDER BY epoch, shard, pos""".stripMargin,

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
         |FROM e ORDER BY shard, seq_id, doc_id""".stripMargin,

    // the identical two-pointer recurrence as a RECURSIVE CTE stepping
    // one state row per shard (the q180-walk discipline). NOT
    // list_reduce: DuckDB 1.0's reduce mis-evaluates a struct-CASE
    // lambda that both reads and rebuilds the accumulator (traced: one
    // step advanced p by two pairs) — the recursive-term form is the
    // battle-tested path every other twin walks
    "q218_pack2_bins" ->
      s"""WITH RECURSIVE lens AS (
         |  SELECT doc_id % $DefaultShards AS shard,
         |    least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT), $DefaultBudget) AS l
         |  FROM documents),
         |$duckPack2Tail""".stripMargin,

    // the assignment twin: the SAME state recursion, read as a full
    // trace — every intermediate (i, j) state emits its transition's
    // rank ranges, docs join by rank, bins key on min doc_id
    "q223_pack2_assign" ->
      s"""WITH RECURSIVE lens AS (
         |  SELECT doc_id, doc_id % $DefaultShards AS shard,
         |    least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT), $DefaultBudget) AS l
         |  FROM documents),
         |$duckPack2AssignTail""".stripMargin,

    // the BPE-denominated assignment twin: the q144 training chain's
    // per-doc counts feeding the IDENTICAL trace-replay fragment
    "q226_pack2_assign_bpe" -> Bpe.duckSqlWith(
      s""",
         |seg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym FROM it${Bpe.DefaultMerges} GROUP BY w),
         |tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents),
         |tc AS (
         |  SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_toks
         |  FROM tok JOIN seg USING (w) WHERE w <> '' GROUP BY doc_id),
         |lens AS (
         |  SELECT doc_id, doc_id % $DefaultShards AS shard,
         |    least(n_toks, $DefaultBudget) AS l FROM tc),
         |$duckPack2AssignTail""".stripMargin),

    // the BPE-denominated twin: the q144 training chain's per-doc
    // counts feed the IDENTICAL pack-2 recursion fragment
    "q219_pack2_bpe" -> Bpe.duckSqlWith(
      s""",
         |seg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym FROM it${Bpe.DefaultMerges} GROUP BY w),
         |tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents),
         |tc AS (
         |  SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_toks
         |  FROM tok JOIN seg USING (w) WHERE w <> '' GROUP BY doc_id),
         |lens AS (
         |  SELECT doc_id % $DefaultShards AS shard,
         |    least(n_toks, $DefaultBudget) AS l FROM tc),
         |$duckPack2Tail""".stripMargin),

    // the q144 token-count CTE chain feeding the q56 packing SQL
    "q157_bpe_packing" -> Bpe.duckSqlWith(
      s""",
         |seg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym FROM it${Bpe.DefaultMerges} GROUP BY w),
         |tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents),
         |tc AS (
         |  SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_toks
         |  FROM tok JOIN seg USING (w) WHERE w <> '' GROUP BY doc_id),
         |t AS (SELECT doc_id, doc_id % $DefaultShards AS shard, n_toks FROM tc),
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
         |FROM e ORDER BY shard, seq_id, doc_id""".stripMargin),

    "q124_shard_manifest" ->
      s"""SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(bit_xor(h) AS BIGINT) AS checksum,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM (
         |  SELECT doc_id,
         |    ((doc_id % 1000000007) * 2654435761 + 40503) % $DefaultManifestShards AS shard,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_toks,
         |    ${duckHash48("text")} AS h
         |  FROM documents)
         |GROUP BY shard ORDER BY shard""".stripMargin,

    // the merged manifest must equal the whole-corpus one — same SQL
    "q132_manifest_merge" ->
      s"""SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(bit_xor(h) AS BIGINT) AS checksum,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM (
         |  SELECT doc_id,
         |    ((doc_id % 1000000007) * 2654435761 + 40503) % $DefaultManifestShards AS shard,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_toks,
         |    ${duckHash48("text")} AS h
         |  FROM documents)
         |GROUP BY shard ORDER BY shard""".stripMargin
  )
}
