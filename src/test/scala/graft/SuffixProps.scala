package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.SuffixDedup

/** Property harness for the r18 suffix-array restructure (slice-seeded
  * doubling, ≤4-window class key, slim round state): random small-
  * alphabet corpora — where ≥minSpan repeats are COMMON — against a
  * brute-force window reference computed in plain Scala. The reference
  * takes the duplicated-window route (the same equivalence theorem the
  * DuckDB twin checks), so agreement here pins the distributed plan's
  * class test, span merge, and remove-all cut across arbitrary overlap
  * shapes, not just the planted fixtures. */
object SuffixProps extends Properties("graft.suffix") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  lazy val spark = SparkTestSession.spark

  /** Doc text over a 3-token alphabet — tiny vocab forces long shared
    * runs at modest lengths. */
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield toks.mkString(" ")

  /** Brute force: every position whose k-token window string occurs
    * more than once in the corpus marks [pos, pos+k); marks merge per
    * doc; ALL marked tokens drop. */
  private def reference(docs: Seq[(Long, String)],
      k: Int): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.filter(_ => t.trim.nonEmpty) }
    val wins = toks.flatMap { case (id, ts) =>
      ts.sliding(k).zipWithIndex.collect {
        case (w, i) if w.size == k => (w.mkString(" "), id, i + 1) } }
    val dupped = wins.groupBy(_._1).filter(_._2.size > 1).values.flatten
    val spansByDoc = dupped.toSeq.map { case (_, id, s) => id -> s }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    toks.map { case (id, ts) =>
      val cut = spansByDoc.getOrElse(id, Seq.empty)
        .flatMap(s => s until (s + k)).toSet
      val kept = ts.zipWithIndex.collect {
        case (tk, ix) if !cut.contains(ix + 1) => tk }
      id -> (ts.size.toLong, (ts.size - kept.size).toLong, kept.mkString(" "))
    }.toMap
  }

  property("suffixArrayDedup + suffixCutText equal the window reference") =
    forAll(Gen.listOfN(8, docGen), Gen.chooseNum(2, 6)) { (texts, k) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val nonEmpty = docs.filter(_._2.trim.nonEmpty)
      val df = nonEmpty.toDF("doc_id", "text")
      val want = reference(nonEmpty, k)
      val gotFp = SuffixDedup.suffixArrayDedup(df, minSpan = k)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val gotTx = SuffixDedup.suffixCutText(df, minSpan = k)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      nonEmpty.forall { case (id, _) =>
        val (n, rm, clean) = want(id)
        gotFp(id) == ((n, rm)) && gotTx(id) == clean
      }
    }
}
