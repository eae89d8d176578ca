package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, WordPiece}
import graft.plans.{BpeEncodeModel, TokenizerModel, UnigramEncodeModel, WordPieceEncodeModel}

/** The shipped-artifact encoder (q188/q189) against the seg-join apply
  * path it must reproduce: kernel ≡ join row-for-row on the real
  * corpus, plus the unit edge cases the equivalence argument leans on
  * (greedy-left alternation on self-pairs, code-point splitting on
  * non-BMP text, the Spark-trim/split word semantics). */
class TokenizerKernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q188 BPE kernel encode equals the seg-join apply on the corpus") {
    assert(rows(SparkEntry.queries("q188_bpe_encode")(spark, sf)) ==
      rows(SparkEntry.queries("q144_bpe_tokenize")(spark, sf)))
  }

  test("q189 WordPiece kernel encode equals the pointer-doubled seg join") {
    assert(rows(SparkEntry.queries("q189_wordpiece_encode")(spark, sf)) ==
      rows(SparkEntry.queries("q174_wordpiece_tokenize")(spark, sf)))
  }

  test("BPE self-pair merges alternate greedy-left (the training run rule)") {
    val m = new BpeEncodeModel(Array("a"), Array("a"))
    // runs of k 'a's keep ceil(k/2) symbols: aaaa -> aa|aa, aaa -> aa|a
    assert(m.tokenCount("aaaa") == 2L)
    assert(m.tokenCount("aaa") == 2L)
    assert(m.tokenCount("a") == 1L)
    assert(m.tokenCount("aaaaa") == 3L)
  }

  test("BPE merges match the PRE-pass sequence only (no cascade within a pass)") {
    // one (a,b) pass over "aab": the only occurrence is at position 1
    val m = new BpeEncodeModel(Array("a"), Array("b"))
    assert(m.tokenCount("aab") == 2L) // a | ab
    // a second pass (a, ab) then catches the cascade
    val m2 = new BpeEncodeModel(Array("a", "a"), Array("b", "ab"))
    assert(m2.tokenCount("aab") == 1L) // aab
  }

  test("kernels walk code points, not UTF-16 units") {
    val smile = new String(Character.toChars(0x1F600)) // non-BMP, 2 chars
    val bpe = new BpeEncodeModel(Array(smile), Array(smile))
    assert(bpe.tokenCount(smile * 4) == 2L)
    val wp = new WordPieceEncodeModel(Array(smile + smile), 6)
    assert(wp.tokenCount(smile * 4) == 2L)
    // and an unseen code point consumes exactly one token (total coverage)
    assert(wp.tokenCount(smile + "z") == 2L)
  }

  test("MaxMatch takes the longest piece, not the first") {
    val wp = new WordPieceEncodeModel(Array("ab", "abc"), 6)
    assert(wp.tokenCount("abcd") == 2L) // abc | d, not ab | c | d
  }

  test("docCounts replicates split(trim(text), '\\s+') word semantics") {
    val m = new BpeEncodeModel(Array.empty, Array.empty)
    def wc(s: String): Long =
      m.docCounts(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toLongArray()(0)
    assert(wc("  a  b  ") == 2L)
    assert(wc("a\tb\nc") == 3L)
    assert(wc("") == 0L)
    assert(wc("   ") == 0L)
    // Spark's trim strips 0x20 only: a leading tab survives trim and
    // split emits a leading empty fragment, which the w <> '' filter drops
    assert(wc("\ta b") == 2L)
  }

  test("q194 unigram kernel encode equals the in-plan packed DP") {
    assert(rows(SparkEntry.queries("q194_unigram_encode")(spark, sf)) ==
      rows(SparkEntry.queries("q180_unigram_viterbi")(spark, sf)))
  }

  test("unigram kernel DP picks max score then min tokens, both channels packed") {
    // vocab: a, b, ab — ln-scores chosen so 'ab' beats 'a'+'b'
    val m = new UnigramEncodeModel(
      Array("a", "b", "ab"), Array(-2000000L, -2000000L, -1000000L), 6)
    val v = m.wordValue("ab")
    assert(m.tokensOf(v) == 1L)       // one piece 'ab', not a|b
    assert(m.scoreOf(v) == -1000000L) // its score, not -4e6
    val v2 = m.wordValue("aba")
    assert(m.tokensOf(v2) == 2L)      // ab|a beats a|b|a
    assert(m.scoreOf(v2) == -3000000L)
  }

  test("unigram kernel: min-token tie-break and the unk floor") {
    // equal-score tie: 'aa' (1 piece) vs 'a','a' (2 pieces, same total)
    val m = new UnigramEncodeModel(
      Array("a", "aa"), Array(-1000000L, -2000000L), 6)
    val v = m.wordValue("aa")
    assert(m.tokensOf(v) == 1L) // same score -2e6, fewer tokens wins
    // off-inventory char: one token at the documented floor
    val u = m.wordValue("z")
    assert(m.tokensOf(u) == 1L && m.scoreOf(u) == UnigramEncodeModel.UnkScoreE6)
  }

  test("unigram kernel refuses words past the 1023-char packed budget") {
    val m = new UnigramEncodeModel(Array("a"), Array(-1000000L), 6)
    intercept[IllegalArgumentException] { m.wordValue("a" * 1024) }
    assert(m.tokensOf(m.wordValue("a" * 1023)) == 1023L)
  }

  test("word cache caps instead of growing without bound") {
    val m = new BpeEncodeModel(Array("a"), Array("a"))
    (0 until TokenizerModel.CacheCap + 10).foreach(i => m.tokenCount(s"w$i"))
    // still correct past the cap
    assert(m.tokenCount("aaaa") == 2L)
  }
}
