package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalCuration

/** q227 — the incremental v5 curation fold, driven doc-by-doc through
  * planted cross-batch interactions: every retroactive path (a delta
  * doc re-duplicating a batch-1 span, a delta eval doc contaminating a
  * batch-1 train doc, a delta doc evicting a capped batch-1 doc) must
  * fire, and the incremental survivor set must be ROW-IDENTICAL to the
  * batch chain over the union (which runs the suffix-ARRAY route where
  * the fold runs the window route — the q204 equivalence re-proven in
  * the incremental context). */
class IncrementalCurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Split = 60L

  // unique-per-doc filler tokens (~6–8 chars: inside the quality gate's
  // mean-word-length band, zero symbols)
  private def toks(id: Long, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"d${id}x$i")
  private def doc(id: Long, source: String, t: Seq[String]) =
    (id, t.mkString(" "), source)

  // Doc ids for asserted specimens avoid the repo's standing planted-
  // repetition residues (dupLines re-appends a paragraph for id%6=1 and
  // a line for id%4=2; gopherNgrams appends 12 tokens for id%7=3), and
  // every doc is ≥ ~40 tokens so the natural Gopher top-4-gram fraction
  // sits well inside its threshold — gate verdicts are then fully
  // predictable per specimen.
  private val capIds =
    Seq(27L, 28L, 29L, 32L, 33L, 35L, 36L, 39L, 40L, 41L, 44L, 47L, 48L, 51L, 53L, 56L)

  private lazy val corpus: Seq[(Long, String, String)] = {
    val donor12 = toks(12L, 120)
    val donor16 = toks(16L, 64)
    val donor20 = toks(20L, 60)
    val batch1 =
      (0L to 9L).map(i => doc(i, "f1", toks(i, 60))) ++ Seq(
        doc(15L, "f1", toks(15L, 60)),          // semantic-dropped (batch 1)
        doc(11L, "a", toks(11L, 60)),           // exact-dup donor
        doc(12L, "a", donor12),                 // 50-span donor
        doc(16L, "a", donor16),                 // passage-cell donor
        doc(20L, "a", donor20)) ++              // eval-leak victim
      // a capped source: 16 docs, strictly decreasing length — batch 1's
      // own cap already evicts the shortest (id 56)
      capIds.zipWithIndex.map { case (id, k) => doc(id, "cap", toks(id, 90 - 2 * k)) }
    val batch2 =
      (60L to 69L).map(i => doc(i, "b", toks(i, 60))) ++ Seq(
        doc(75L, "b", toks(75L, 60)),           // semantic-dropped (delta)
        doc(71L, "a", toks(11L, 60)),           // EXACT copy of doc 11
        // one fresh token, then donor 12's tokens 3..57 (grid-MISALIGNED
        // vs the donor's 8-token cells — the q224 lesson), then 40 fresh
        doc(72L, "a", toks(72L, 1) ++ donor12.slice(2, 57) ++ toks(72L, 40, from = 100)),
        // an ALIGNED verbatim first cell of donor 16 + 48 fresh tokens
        doc(76L, "a", donor16.take(8) ++ toks(76L, 48, from = 100)),
        // a cap-source doc longer than every batch-1 one → evicts #15
        doc(81L, "cap", toks(81L, 100)),
        // the delta EVAL doc (100 % 97 = 3): carries a 6-gram of batch-1
        // train doc 20 — the cross-batch contamination plant
        doc(100L, "f1", toks(100L, 5) ++ donor20.slice(4, 10) ++ toks(100L, 5, from = 50)))
    batch1 ++ batch2
  }

  private lazy val corpusDf =
    corpus.toDF("doc_id", "text", "source")
  private lazy val semDrop = Seq(15L, 75L).toDF("doc_id")

  private lazy val statePath = {
    val p = java.nio.file.Files
      .createTempDirectory("graft_incr_spec").toString
    IncrementalCuration.buildState(
      corpusDf.where(s"doc_id < $Split"), semDrop, None, p)
    p
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "source", "n_chars", "n_toks").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  private lazy val keptInc = rows(IncrementalCuration.incrementalKept(
    spark, corpusDf.where(s"doc_id >= $Split"), semDrop, None, statePath))
  private lazy val keptBatch = rows(IncrementalCuration.batchKept(
    corpusDf, semDrop, None))
  private lazy val kept1 = rows(spark.read.parquet(s"$statePath/kept"))

  private def ntoks(rows: Array[(Long, String, Long, Long)], id: Long) =
    rows.collectFirst { case (d, _, _, n) if d == id => n }

  test("incremental survivor set ≡ batch-over-union, doc-identical") {
    assert(keptInc.toSet == keptBatch.toSet)
    assert(keptInc.nonEmpty)
  }

  test("cross-batch EXACT duplicate caught: the delta copy drops, the batch-1 original stays") {
    assert(ntoks(keptInc, 11L).nonEmpty)
    assert(ntoks(keptInc, 71L).isEmpty)
  }

  test("cross-batch SPAN duplicate retro-cuts the batch-1 donor (and the delta copy)") {
    // batch 1 alone: doc 12's 55-token span is unique — survives whole
    assert(ntoks(kept1, 12L).contains(120L))
    // union: the delta plant re-duplicates it — BOTH occurrences cut
    // (donor loses its merged [3,58) span; plant loses [2,57))
    assert(ntoks(keptInc, 12L).contains(65L))
    assert(ntoks(keptInc, 72L).contains(41L))
  }

  test("cross-batch PASSAGE duplicate: the delta doc loses the verbatim aligned cell") {
    assert(ntoks(keptInc, 76L).contains(48L))
    assert(ntoks(keptInc, 16L).contains(64L)) // smaller-id donor untouched
  }

  test("cross-batch EVAL LEAK retro-scrubs the batch-1 train doc") {
    // batch 1 alone: doc 20 is clean (60 tokens); the delta eval doc's
    // 6-gram scrubs tokens 5..10 out of it retroactively
    assert(ntoks(kept1, 20L).contains(60L))
    assert(ntoks(keptInc, 20L).contains(54L))
    // the eval doc itself never enters the training survivors
    assert(ntoks(keptInc, 100L).isEmpty)
  }

  test("cap eviction is rank-local: the longer delta doc displaces exactly the #15 batch-1 doc") {
    // batch 1 kept ranks 1..15 (56, its own 16th, already out); the
    // 100-token delta doc enters at rank 1 and pushes 53 out
    assert(ntoks(kept1, 53L).nonEmpty && ntoks(kept1, 56L).isEmpty)
    assert(ntoks(keptInc, 81L).nonEmpty)
    assert(ntoks(keptInc, 53L).isEmpty)
    assert(ntoks(keptInc, 51L).nonEmpty)
  }

  test("semantic drops apply on both sides of the split") {
    assert(ntoks(keptInc, 15L).isEmpty && ntoks(keptInc, 75L).isEmpty)
  }

  test("registered summary shape: incremental rows ≡ batch-reference rows") {
    val inc = IncrementalCuration.incrementalCurate(
        spark, corpusDf.where(s"doc_id >= $Split"), Split, semDrop, None, statePath)
      .collect().map(_.toSeq)
    val ref = IncrementalCuration.batchReference(corpusDf, Split, semDrop, None)
      .collect().map(_.toSeq)
    assert(inc.toSeq == ref.toSeq)
  }
}
