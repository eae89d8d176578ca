package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, IncrementalCuration, SuffixDedup, TextAnalysis}

/** The q224 stage-attribution discipline generalized to EVERY stage of
  * the composed v5 chain (the r19 verdict's Next #4): the grid-alignment
  * bug class — a plant silently handled by the WRONG stage while both
  * engines stay hash-green — is only excluded by asserting, in-chain,
  * that each planted family passes every upstream stage VERBATIM and is
  * cut by exactly its designed stage. Runs the real registered corpus
  * (the q221 planted-span corpus over sf0.001) through the real stage
  * frames ([[IncrementalCuration.batchStages]], the q227-gated chain)
  * and attributes every removal/rewrite:
  *  - span plants: untouched by exact dedup and passage rewrite
  *    (alignment!), cut at suffix_cut — donors with the span intact cut
  *    with them;
  *  - semantic drops: exactly the persisted ANN verdict ids present at
  *    the stage input, text untouched;
  *  - quality: exactly the failures of an INDEPENDENT re-implementation
  *    of the gate rule, survivors verbatim;
  *  - the decontam carve: eval docs leave at scrub and nowhere earlier;
  *    the scrub alters exactly the train docs sharing a 6-gram with the
  *    eval carve (independent shingle check), everyone else verbatim;
  *  - Gopher/cap: removals equal the standalone operators' verdicts on
  *    the stage input. */
class StageAttributionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, sf)
  lazy val off = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
    .first.getLong(0) + 1
  lazy val frames: Map[String, org.apache.spark.sql.DataFrame] =
    IncrementalCuration.batchStages(
      SuffixDedup.plantedSpanCorpus(docs, withSource = true),
      IncrementalCuration.semDropFor(spark, sf)).toMap

  private def texts(name: String): Map[Long, String] =
    frames(name).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  lazy val raw = texts("raw")
  lazy val d1 = texts("exact_dedup")
  lazy val rw = texts("passage_rewrite")
  lazy val sx = texts("suffix_cut")
  lazy val d3 = texts("semantic_drop")
  lazy val quality = texts("quality")
  lazy val scrub = texts("scrub")
  lazy val clean = texts("gopher")
  lazy val kept = texts("source_cap")

  test("span plants pass exact dedup and passage rewrite verbatim; suffix_cut cuts them AND their span-intact donors") {
    val plants = raw.keys.filter(_ >= off).toSeq.sorted
    assert(plants.nonEmpty, "the planted corpus must carry span plants")
    plants.foreach { p =>
      assert(d1.get(p).contains(raw(p)), s"plant $p altered/dropped at exact dedup")
      assert(rw.get(p).contains(raw(p)),
        s"plant $p altered at passage rewrite — the grid-alignment regression q224 exists to catch")
      assert(sx.get(p).exists(_ != raw(p)), s"plant $p NOT cut at the suffix stage")
    }
    // every donor whose passage-rewritten text still carries the planted
    // 55-token span verbatim must be cut at the same stage
    var donorsCut = 0
    plants.foreach { p =>
      val ptoks = raw(p).split(" ")
      val span = ptoks.slice(1, ptoks.length - 1).mkString(" ")
      val d = p - off
      if (rw.get(d).exists(_.contains(span))) {
        assert(sx.get(d).exists(!_.contains(span)),
          s"donor $d kept its duplicated span past the suffix stage")
        donorsCut += 1
      }
    }
    assert(donorsCut > 0, "no donor reached the suffix stage span-intact")
  }

  test("semantic_drop removes exactly the persisted ANN verdicts present at its input, texts untouched") {
    val semIds = IncrementalCuration.semDropFor(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val droppedHere = sx.keySet -- d3.keySet
    assert(droppedHere == (semIds & sx.keySet),
      s"semantic stage dropped ${droppedHere.size} docs, verdict says ${(semIds & sx.keySet).size}")
    d3.foreach { case (id, t) => assert(sx(id) == t, s"semantic stage altered doc $id") }
  }

  test("quality removes exactly the independent re-implementation's failures, survivors verbatim") {
    def passes(text: String): Boolean = {
      val toks = text.trim.split("\\s+")
      if (toks.length < 2) return false
      val meanE2 = math.round(100.0 * toks.map(_.length).sum / toks.length)
      val symbols = text.count(c =>
        !(c.isDigit || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == ' '))
      val symE4 = math.round(10000.0 * symbols / text.length)
      toks.length >= 5 && toks.length <= 100000 &&
        meanE2 >= 200 && meanE2 <= 1200 && symE4 < 3000
    }
    val want = d3.filter { case (_, t) => passes(t) }
    assert(quality.keySet == want.keySet,
      s"quality drop set diverges from the independent rule: " +
        s"only-chain=${(quality.keySet -- want.keySet).take(5)}, " +
        s"only-rule=${(want.keySet -- quality.keySet).take(5)}")
    quality.foreach { case (id, t) => assert(d3(id) == t, s"quality altered doc $id") }
  }

  test("eval docs leave at scrub and nowhere earlier; the scrub alters exactly the contaminated train docs") {
    val evalIds = quality.keySet.filter(_ % 97 == 3)
    assert(evalIds.nonEmpty, "the carve must be non-empty for the test to bite")
    assert((scrub.keySet & evalIds).isEmpty, "an eval doc survived into the scrubbed frame")
    // independent contamination check: 6-gram sets in plain Scala
    def grams(t: String): Set[String] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 6) Set.empty
      else (0 to toks.length - 6).map(i => toks.slice(i, i + 6).mkString(" ")).toSet
    }
    val evalSh = evalIds.flatMap(id => grams(quality(id)))
    val train = quality.view.filterKeys(_ % 97 != 3).toMap
    train.foreach { case (id, t) =>
      val contaminated = grams(t).exists(evalSh)
      scrub.get(id) match {
        case Some(st) if contaminated =>
          assert(st != t, s"contaminated train doc $id left the scrub unaltered")
        case Some(st) =>
          assert(st == t, s"clean train doc $id was altered by the scrub")
        case None =>
          // leaving entirely is legal only through the re-gate, which
          // only a scrubbed (contaminated) doc can trigger
          assert(contaminated, s"clean train doc $id vanished at the scrub stage")
      }
    }
  }

  test("gopher removes exactly the standalone gate verdicts on the scrubbed frame, texts untouched") {
    val f = frames("scrub")
    val glPass = TextAnalysis.dupLines(f.select("doc_id", "text"))
      .where("passes").collect().map(_.getLong(0)).toSet
    val gnPass = TextAnalysis.gopherNgrams(f.select("doc_id", "text"))
      .where("passes").collect().map(_.getLong(0)).toSet
    assert(clean.keySet == (scrub.keySet & glPass & gnPass))
    clean.foreach { case (id, t) => assert(scrub(id) == t, s"gopher altered doc $id") }
  }

  test("source_cap removes exactly the standalone rank>15 verdicts, texts untouched") {
    val capIds = Curation.sourceCap(frames("gopher"))
      .collect().map(_.getLong(0)).toSet
    assert(kept.keySet == (clean.keySet & capIds))
    kept.foreach { case (id, t) => assert(clean(id) == t, s"cap altered doc $id") }
  }
}
