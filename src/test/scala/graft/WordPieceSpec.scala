package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordPiece

/** Semantic pins for the WordPiece tokenizer the oracle hash can't
  * localize on its own: the pointer-doubled walk must equal a
  * sequential greedy longest-match reference, coverage must be total
  * (chars always in-vocab ⇒ no OOV), and token counts must conserve
  * characters under the piece-length bound. */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential greedy longest-match over an explicit vocab — the
    * textbook MaxMatch loop the distributed pointer-doubling must
    * reproduce token-for-token. */
  private def refTokens(w: String, vocab: Set[String]): Int = {
    var pos = 0
    var n = 0
    while (pos < w.length) {
      var l = math.min(WordPiece.MaxPieceLen, w.length - pos)
      while (l > 1 && !vocab(w.substring(pos, pos + l))) l -= 1
      pos += l
      n += 1
    }
    n
  }

  // a corpus engineered so greedy MaxMatch differs from both extremes:
  // "abcdef" is in-vocab whole (1 token), "abcdefg" greedily takes
  // "abcdef" + "g" (2), "gabcdef" takes whatever prefix pieces exist —
  // repetition weights push multi-char pieces over the top-V cut
  private lazy val docs = Seq(
    (1L, "abcdef abcdef abcdef ab cd ef"),
    (2L, "abcdefg gabcdef xyz"),
    (3L, "ab ab ab cd cd ef zq"),
    (4L, "abcdefg abcdefg xyz xyz zq")
  ).toDF("doc_id", "text")

  private lazy val vocabRows =
    WordPiece.wordpieceVocab(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  private lazy val vocab = vocabRows.map(_._1).toSet

  test("vocabulary contains every character of the corpus (total coverage)") {
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.split("\\s+")).flatMap(_.toCharArray).map(_.toString).toSet
    assert(chars.subsetOf(vocab), s"missing chars: ${chars -- vocab}")
  }

  test("no piece exceeds MaxPieceLen and counts are positive") {
    assert(vocabRows.forall { case (s, l, c) =>
      l == s.length.toLong && l <= WordPiece.MaxPieceLen && c > 0 })
  }

  test("pointer-doubled token counts equal the sequential MaxMatch reference") {
    val got = WordPiece.wordpieceTokenCounts(docs)
      .as[(Long, Long, Long)].collect()
      .map { case (d, w, t) => d -> ((w, t)) }.toMap
    val want = docs.as[(Long, String)].collect().map { case (d, text) =>
      val ws = text.trim.split("\\s+").filter(_.nonEmpty)
      d -> ((ws.length.toLong, ws.map(w => refTokens(w, vocab).toLong).sum))
    }.toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("token counts are bounded: ceil(len/MaxPieceLen) <= tokens <= len") {
    val ws = docs.as[(Long, String)].collect()
      .flatMap(_._2.split("\\s+")).filter(_.nonEmpty).distinct
    ws.foreach { w =>
      val n = refTokens(w, vocab)
      assert(n <= w.length && n >= (w.length + WordPiece.MaxPieceLen - 1) / WordPiece.MaxPieceLen,
        s"word $w: $n tokens out of bounds")
    }
  }

  test("a word longer than every multi-char piece still tokenizes (char fallback)") {
    val lonely = Seq((1L, "zzzzzzzzzzzz qqq")).toDF("doc_id", "text")
    // every substring is a run of z (or q); vocab still covers it and
    // the greedy walk terminates — 12 z's at MaxPieceLen 6 = 2 tokens
    val out = WordPiece.wordpieceTokenCounts(lonely)
      .as[(Long, Long, Long)].collect()
    assert(out.sameElements(Array((1L, 2L, 3L))), out.mkString(","))
  }
}
