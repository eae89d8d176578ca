package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SuffixDedup}

/** The q204 suffix-array machinery, pinned from three sides:
  *
  *  1. Prefix-doubled ranks ≡ a SEQUENTIAL suffix sort (the verdict's
  *     requested witness): on a corpus small enough to sort suffixes
  *     driver-side, the distributed doubling's rank order — uncapped
  *     depth, ties broken by packed position — must equal the order a
  *     plain `sorted` over the token suffixes produces, suffix for
  *     suffix. Includes repeated substrings so tied ranks survive
  *     several rounds before splitting.
  *  2. Capped-depth runs stay contiguous: with depth capped at the next
  *     power of two ≥ minSpan (the production setting), positions
  *     sharing a ≥minSpan-token prefix must land adjacent — the
  *     property the q204 pair test stands on.
  *  3. End-to-end span semantics on planted inputs: a long duplicated
  *     span is cut from ALL its occurrences (remove-all — the
  *     published tool's self-dedup default, distinct from q152's
  *     keep-first), a shared span SHORTER than minSpan is kept
  *     everywhere, and untouched docs pass through fingerprint-intact.
  */
class SuffixArraySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Position frame (gpos, doc_id, pos, tok) for suffixRanks. */
  private def posFrame(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') AS toks")
      .selectExpr("doc_id", "toks", "explode(sequence(1, size(toks))) AS pos")
      .selectExpr("doc_id * 1048576 + pos AS gpos", "doc_id", "pos",
        "element_at(toks, cast(pos as int)) AS tok")

  /** Sequential reference: all (suffix tokens, gpos) sorted — Scala's
    * Seq ordering is lexicographic with shorter-prefix-first, exactly
    * the doubling's absent-extension convention. */
  private def sequentialOrder(docs: Seq[(Long, String)]): Seq[Long] = {
    import scala.math.Ordering.Implicits._
    docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      (1 to toks.size).map(p => (toks.drop(p - 1), id * 1048576L + p))
    }.sorted.map(_._2)
  }

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a quick brown fox leaps over a lazy dog",
    3L -> "the quick brown fox jumps over the quick brown fox",
    4L -> "zebra zebra zebra zebra zebra",
    5L -> "one two three four five six seven")

  test("prefix-doubled ranks equal a sequential suffix sort") {
    val ranked = SuffixDedup.suffixRanks(posFrame(corpus), maxDepth = 1024)
      .orderBy(col("rank"), col("gpos"))
      .select("gpos").as[Long].collect().toSeq
    assert(ranked == sequentialOrder(corpus))
  }

  test("capped depth keeps equal-prefix runs contiguous") {
    val minSpan = 4
    // depth cap 4 (next power of two ≥ 4): docs share a 4-token run
    val docs = Seq(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "eta alpha beta gamma delta theta",
      12L -> "iota kappa alpha beta gamma delta")
    val ranked = SuffixDedup.suffixRanks(posFrame(docs), maxDepth = 4)
      .orderBy(col("rank"), col("gpos"))
      .select("doc_id", "pos").as[(Long, Long)].collect().toSeq
    // the three positions starting "alpha beta gamma delta" must be
    // adjacent in rank order
    val hits = Set((10L, 1L), (11L, 2L), (12L, 3L))
    val idxs = ranked.zipWithIndex.collect {
      case (p, i) if hits(p) => i
    }
    assert(idxs.size == 3 && idxs.max - idxs.min == 2,
      s"equal-prefix run not contiguous: $idxs in $ranked")
  }

  test("duplicated >= minSpan spans are cut from ALL occurrences") {
    val span = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      1L -> s"u1 $span v1 w1",
      2L -> s"u2 u2b $span v2",
      3L -> "unrelated words only here nothing repeats at all")
    val byDoc = SuffixDedup.suffixArrayDedup(docs.toDF("doc_id", "text"),
        minSpan = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byDoc(1L) == (15L, 12L)) // both copies cut, flanks survive
    assert(byDoc(2L) == (15L, 12L))
    assert(byDoc(3L)._2 == 0L)
  }

  test("shared spans shorter than minSpan survive") {
    val short = (1 to 6).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 $short b1 c1 d1 e1 f1",
      2L -> s"a2 $short b2 c2 d2 e2 f2")
    val out = SuffixDedup.suffixArrayDedup(docs.toDF("doc_id", "text"),
        minSpan = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("v4 composition: a span duplicate passage dedup misses is cut by the suffix stage") {
    import spark.implicits._
    // doc 2 copies 56 of doc 1's tokens at OFFSET 1 (one fresh flank
    // token ahead), so every 8-token passage of the copy is misaligned
    // against doc 1's grid — q139's aligned-window dedup keeps both
    // docs verbatim — while the ≥50-token duplicated span is exactly
    // what the q214 suffix stage exists to cut (remove-all: both sides)
    val span = (1 to 56).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> s"$span tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8",
      2L -> s"flank $span end1 end2 end3 end4 end5 end6 end7")
      .toDF("doc_id", "text")
    val pd = graft.operators.Dedup.passageDedup(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pd == orig, "passage dedup must MISS the misaligned span copy")
    val sx = SuffixDedup.suffixCutText(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!sx(1L).contains("w1 ") && !sx(2L).contains("w1 "),
      s"the suffix stage must cut the span from BOTH docs: $sx")
    assert(sx(1L).contains("tail1") && sx(2L).contains("flank") &&
      sx(2L).contains("end1"), s"flanks must survive the cut: $sx")
  }

  test("q204 plant: donors and plants both lose the copied window") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = SuffixDedup.plantedSpanCorpus(docs)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val out = SuffixDedup.suffixArrayDedup(corpus).cache()
    val plants = out.where(s"doc_id > $maxId")
    assert(plants.count() > 0)
    // every plant loses its 55-token copied interior (flanks survive)
    assert(plants.where("n_removed < 55").count() == 0)
    // remove-all: every donor of a plant loses tokens too
    val donors = out.where(s"doc_id <= $maxId AND doc_id % 17 = 5")
      .join(plants.selectExpr(s"doc_id - ${maxId + 1} AS doc_id"), "doc_id")
    assert(donors.where("n_removed = 0").count() == 0)
    out.unpersist()
  }

  test("in-chain stage attribution: passage dedup leaves every plant whole, the suffix stage cuts every plant") {
    // the round-18 off-by-one this pins: a plant housing donor offset 2
    // behind one flank token is grid-ALIGNED (plant pos p = donor pos
    // p), so the passage stage silently did the suffix stage's work in
    // the composed chain — the q224 funnel's suffix_cut row read zero.
    // With donor offset 3 the plants are misaligned for real: the
    // passage stage must pass them verbatim and the suffix stage must
    // cut every one of them, in exactly the q214/q221 stage order.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = SuffixDedup.plantedSpanCorpus(docs)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val d1 = graft.operators.Relational.keepFirst(
      corpus.withColumn("fp", md5(col("text"))),
      Seq("fp"), Seq(col("doc_id"))).drop("fp")
    val rw = Dedup.passageDedup(d1.select("doc_id", "text")).cache()
    val orig = corpus.selectExpr("doc_id", "text AS orig")
    val plantsRw = rw.where(s"doc_id > $maxId").join(orig, "doc_id")
    assert(plantsRw.count() > 0)
    assert(plantsRw.where("text_kept != orig").count() == 0,
      "passage dedup must pass every grid-misaligned plant untouched")
    val sx = SuffixDedup.suffixCutText(
      rw.selectExpr("doc_id", "text_kept AS text"), earlyExit = false)
    val plantsSx = sx.where(s"doc_id > $maxId").join(orig, "doc_id")
    assert(plantsSx.where("text_kept = orig").count() == 0,
      "the suffix stage must cut every plant's copied interior")
    rw.unpersist()
  }
}
