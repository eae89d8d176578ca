package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.WordPiece

/** Property: on RANDOM corpora over a small alphabet (where substring
  * structure is adversarially repetitive — runs, shared prefixes,
  * near-identical words), the pointer-doubled distributed walk must
  * equal a sequential greedy MaxMatch reference word-for-word, with the
  * vocabulary taken from the engine's own q173 output. Each case is one
  * corpus (a handful of Spark jobs), so the case count is tuned down
  * like the other property objects. */
object WordPieceProps extends Properties("graft.wordpiece") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  lazy val spark = SparkTestSession.spark

  private def refTokens(w: String, vocab: Set[String]): Long = {
    var pos = 0; var n = 0L
    while (pos < w.length) {
      var l = math.min(WordPiece.MaxPieceLen, w.length - pos)
      while (l > 1 && !vocab(w.substring(pos, pos + l))) l -= 1
      pos += l; n += 1
    }
    n
  }

  private val wordGen: Gen[String] = for {
    n <- Gen.frequency(4 -> Gen.chooseNum(1, 12), 1 -> Gen.const(17))
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val docGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, wordGen).map(_.mkString(" ")))

  property("pointer-doubled walk == sequential MaxMatch on random corpora") =
    forAll(Gen.listOfN(5, docGen)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val vocab = WordPiece.wordpieceVocab(docs).collect()
        .map(_.getString(0)).toSet
      val got = WordPiece.wordpieceTokenCounts(docs)
        .as[(Long, Long, Long)].collect()
        .map { case (d, w, t) => d -> ((w, t)) }.toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        val ws = t.trim.split("\\s+").filter(_.nonEmpty)
        i.toLong -> ((ws.length.toLong, ws.map(refTokens(_, vocab)).sum))
      }.toMap
      got == want
    }
}
