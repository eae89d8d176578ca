package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Unigram, WordPiece}

/** Semantic pins for the Viterbi unigram tokenizer beyond the oracle
  * hash: the packed DP must equal a sequential reference DP exactly
  * (score AND token count under the (max score, min tokens) tie-break),
  * and Viterbi must DOMINATE greedy MaxMatch in path score — the
  * optimality property that distinguishes the lattice decode from the
  * q174 approximation. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, sf).select("doc_id", "text")

  /** Reference vocabulary + scores, straight from the engine's own q173
    * counts (the spec pins the DP, not the seeding — WordPieceSpec and
    * the q173 oracle pin that). */
  private lazy val (vocab, score) = {
    val rows = WordPiece.wordpieceVocab(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2))
    val tot = rows.map(_._2).sum
    (rows.map(_._1).toSet,
      rows.map { case (s, c) =>
        s -> math.round(1e6 * (math.log(c.toDouble) - math.log(tot.toDouble)))
      }.toMap)
  }

  /** Sequential Viterbi with the exact tie-break: maximize score, then
    * minimize token count. */
  private def refViterbi(w: String): (Long, Long) = {
    val best = Array.fill[(Long, Long)](w.length + 1)(null)
    best(0) = (0L, 0L)
    for (i <- 1 to w.length) {
      var b: (Long, Long) = null
      for (l <- 1 to math.min(WordPiece.MaxPieceLen, i)) {
        val p = w.substring(i - l, i)
        if (vocab(p) && best(i - l) != null) {
          val c = (best(i - l)._1 + score(p), best(i - l)._2 + 1)
          if (b == null || c._1 > b._1 || (c._1 == b._1 && c._2 < b._2)) b = c
        }
      }
      best(i) = b
    }
    (best(w.length)._2, best(w.length)._1)
  }

  private def refGreedy(w: String): (Long, Long) = {
    var pos = 0; var n = 0L; var s = 0L
    while (pos < w.length) {
      var l = math.min(WordPiece.MaxPieceLen, w.length - pos)
      while (l > 1 && !vocab(w.substring(pos, pos + l))) l -= 1
      s += score(w.substring(pos, pos + l)); pos += l; n += 1
    }
    (n, s)
  }

  private lazy val words = docs.selectExpr("explode(split(trim(text), '\\\\s+')) AS w")
    .where("w <> ''").distinct().as[String].collect()

  test("packed DP equals the sequential Viterbi reference per word type (score and tokens)") {
    val got = Unigram.queries("q180_unigram_viterbi")(spark, sf)
    // per-doc sums suffice only if per-word values match — check the
    // per-word seg frame through a 1-word-per-doc corpus instead
    val oneWord = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toSeq.toDF("doc_id", "text")
    val seg = Unigram.unigramTokenCounts(oneWord,
      graft.operators.Unigram.segCounts(WordPiece.wordTypes(docs)))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, _, n, s) => words(d.toInt) -> ((n, s)) }.toMap
    words.foreach { w =>
      assert(seg(w) == refViterbi(w), s"word $w: got ${seg(w)}, want ${refViterbi(w)}")
    }
    assert(got.count() > 0)
  }

  test("Viterbi dominates greedy MaxMatch in path score, never loses on the corpus") {
    var strictlyBetter = 0
    words.foreach { w =>
      val (vn, vs) = refViterbi(w)
      val (gn, gs) = refGreedy(w)
      assert(vs >= gs, s"word $w: Viterbi score $vs below greedy $gs")
      if (vs > gs || (vs == gs && vn < gn)) strictlyBetter += 1
    }
    // the corpus must actually exercise the difference somewhere —
    // otherwise this test pins nothing
    assert(strictlyBetter > 0,
      "corpus never separates Viterbi from greedy; weaken-proof the fixture")
  }

  test("token counts respect the structural bounds") {
    words.foreach { w =>
      val (n, _) = refViterbi(w)
      assert(n >= (w.length + WordPiece.MaxPieceLen - 1) / WordPiece.MaxPieceLen && n <= w.length)
    }
  }

  test("hard-EM refit: corpus Viterbi likelihood is non-decreasing, with a strict witness") {
    import org.apache.spark.sql.functions._
    val types = WordPiece.wordTypes(docs)
    def corpusScore(seg: org.apache.spark.sql.DataFrame): Long =
      seg.join(types, Seq("w"))
        .agg(sum(expr("cnt * score_e6"))).head().getLong(0)
    val seed = Unigram.segCounts(types).localCheckpoint()
    val refit = Unigram.emRefitCounts(types).localCheckpoint()
    // every word type must survive the refit decode (EM prunes pieces,
    // never words: each type's own path pieces keep count >= 1)
    assert(refit.count() == seed.count(), "refit dropped word types")
    assert(refit.where("score_e6 IS NULL OR n_uni IS NULL").count() == 0)
    // classic hard-EM monotonicity: re-fitting scores to the Viterbi
    // path counts cannot lower the weighted corpus path score
    val (s0, s1) = (corpusScore(seed), corpusScore(refit))
    assert(s1 >= s0, s"refit likelihood regressed: seed=$s0 refit=$s1")
    // and the round must actually MOVE the model on this corpus —
    // equality would mean the seed was already an EM fixed point and
    // the test pinned nothing
    assert(s1 > s0, s"seed unexpectedly at the EM fixed point ($s0)")
  }

  test("soft-EM: ambiguous mass spreads; the lattice E-step improves the marginal from any start") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the planted AMBIGUOUS corpus: 'abab' segments as ab·ab or a·ba·b
    // (or abab whole) — hard EM commits all 8 counts to ONE Viterbi
    // path, soft EM spreads expected counts across the lattice
    val types = Seq(("abab", 8L), ("ab", 4L), ("ba", 4L)).toDF("w", "cnt")
    val (histSoft, _) = Unigram.softEmHistory(types, Unigram.SoftEmCap)
    val (histHard, _) = Unigram.emHistory(types, Unigram.EmCap)
    // mass spreading: hard EM's M-step counts only pieces ON some
    // type's single Viterbi path (everything else prunes to zero /
    // drops from the frame); the lattice E-step assigns REAL mass to
    // every reading — both 'ab' and 'ba' far above the 1-at-e6 floor,
    // and a strictly larger supported inventory than hard's path set
    val softMass = histSoft.last.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hardPieces = histHard.last.select("s").collect()
      .map(_.getString(0)).toSet
    assert(softMass("ab") > 1000L && softMass("ba") > 1000L,
      s"both ambiguous readings must hold real soft mass: $softMass")
    assert(softMass.keySet.size > hardPieces.size,
      s"soft support ${softMass.keySet} not wider than hard's $hardPieces")
    assert(hardPieces.subsetOf(softMass.keySet))
    // each variant at its fixed point, scored on soft-EM's OWN
    // objective (corpus marginal likelihood — corpusScoreE6 is the
    // hard/Viterbi yardstick) — ON EQUAL SUPPORT: hard EM's path prune
    // shrinks the inventory, which CONCENTRATES probability (fewer
    // pieces share the normalizer) — a model-selection side effect, not
    // an E-step win, so the raw cross-inventory marginal comparison is
    // apples to oranges (measured: the pruned model's marginal is
    // higher). Re-housing hard's counts in the FULL inventory (the
    // soft M-step's own 1-at-e6 floor for absent pieces, counts
    // e6-rescaled to match) isolates the E-steps — and there the
    // lattice E-step must win, because it optimizes exactly this
    // objective over exactly this support
    val seed = Unigram.seedCountsOf(types)
    val hardFull = seed.selectExpr("s")
      .join(histHard.last.selectExpr("s", "c * 1000000 AS ch"), Seq("s"), "left")
      .selectExpr("s", "coalesce(ch, 1L) AS c")
    val soft = Unigram.corpusMarginalE6(types, histSoft.last)
    val hard = Unigram.corpusMarginalE6(types, hardFull)
    val seedMarginal = Unigram.corpusMarginalE6(types, seed)
    val hardStepped = Unigram.corpusMarginalE6(types,
      Unigram.softStepFrom(types, hardFull))
    info(s"marginals: seed=$seedMarginal soft=$soft hard=$hard hard+softstep=$hardStepped")
    // soft-EM's rounds improve its own objective from the seed (the
    // EM monotonicity theorem, the only cross-model claim that IS one)
    assert(soft >= seedMarginal,
      s"soft-EM marginal regressed vs the seed: $seedMarginal -> $soft")
    // and the lattice E-step improves the marginal from ANY start —
    // including hard-EM's own fixed point re-housed in the full
    // inventory (hard's path prune concentrates mass, a model-selection
    // side effect that can land a better LOCAL optimum than the seed's
    // basin — measured here, documented rather than wished away — but
    // one soft step from that very point must still be non-decreasing)
    assert(hardStepped >= hard,
      s"a soft-EM step regressed the marginal from hard's point: $hard -> $hardStepped")
  }

  test("soft-EM expected counts equal exhaustive segmentation enumeration") {
    import spark.implicits._
    // the lattice forward-backward against the definition it implements:
    // E[count of piece s in w] = Σ_seg P(seg)·(uses of s in seg) / Σ_seg
    // P(seg), enumerated over EVERY segmentation of each planted word —
    // short words, tiny alphabet, so the enumeration is exact and total
    val types = Seq(("abab", 3L), ("aa", 2L), ("abcab", 1L)).toDF("w", "cnt")
    val counts = Unigram.seedCountsOf(types).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = counts.values.sum.toDouble
    val p = counts.map { case (s, c) => s -> (c.toDouble / tot) }
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(6, w.length)).flatMap { l =>
        val piece = w.substring(0, l)
        if (!p.contains(piece)) Nil
        else segs(w.substring(l)).map(piece +: _)
      }
    def refFor(w: String): Map[String, Long] = {
      val all = segs(w)
      val z = all.map(_.map(p).product).sum
      // per-PIECE expectation (edges at different positions sum)
      all.flatMap(seg => seg.map(s => s -> (seg.map(p).product / z)))
        .groupBy(_._1).map { case (s, xs) =>
          s -> math.round(1e6 * xs.map(_._2).sum) }
    }
    val got = Unigram.softEdgesSeed(types).groupBy("w", "s")
      .agg(org.apache.spark.sql.functions.sum("ec").as("ec"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (w <- Seq("abab", "aa", "abcab"); (s, want) <- refFor(w)) {
      val have = got.getOrElse((w, s), 0L)
      // per-edge e6 rounding vs the enumeration's per-piece rounding:
      // allow 1 unit per contributing edge (≤ length(w) edges per piece)
      assert(math.abs(have - want) <= w.length,
        s"E[count($s | $w)] = $have, enumeration says $want")
    }
  }

  test("multi-round hard-EM: monotone per-round likelihood, fixed point inside the cap") {
    val types = WordPiece.wordTypes(docs)
    val (hist, converged) = Unigram.emHistory(types, Unigram.EmCap)
    // termination witness: the loop certified counts_r == counts_{r+1}
    // strictly inside the cap — the identity argument the q206 twin's
    // fixed unrolled depth stands on is EXERCISED here, not assumed
    assert(converged,
      s"EM did not reach its fixed point within ${Unigram.EmCap} rounds")
    assert(hist.size <= Unigram.EmCap)
    // per-round corpus Viterbi likelihood is monotone non-decreasing
    // (seed fit first, then each refit round)
    val seedScore = {
      import org.apache.spark.sql.functions._
      Unigram.segCounts(types).join(types, Seq("w"))
        .agg(sum(expr("cnt * score_e6"))).head().getLong(0)
    }
    val roundScores = hist.map(c => Unigram.corpusScoreE6(types, c))
    val chain = seedScore +: roundScores
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"likelihood regressed between rounds: $chain")
    }
    // the converged model's decode is what q206 serves: its final round
    // must be a TRUE fixed point — one more round changes nothing
    val again = Unigram.corpusScoreE6(types, hist.last)
    assert(again == roundScores.last)
  }

  test("loss-ranked pruning: schedule-exact vocab shrink, survivors dominate, alphabet intact, decode total") {
    import org.apache.spark.sql.functions._
    val types = WordPiece.wordTypes(docs)
    val seedMulti = WordPiece.vocabFrom(WordPiece.candidates(types))
      .where("length(s) > 1").count()
    val hist = Unigram.pruneHistory(types, Unigram.PruneRounds)
    // each round keeps exactly ceil(3K/5) multi-char pieces
    var k = seedMulti
    hist.foreach { inv =>
      val want = (3 * k + 4) / 5
      val got = inv.where("length(s) > 1").count()
      assert(got == want, s"prune round kept $got of $k multi pieces, want $want")
      k = got
    }
    // the alphabet is never pruned (totality's guarantee)
    val seedSingles = WordPiece.vocabFrom(WordPiece.candidates(types))
      .where("length(s) = 1").select("s").collect().map(_.getString(0)).toSet
    val finalSingles = hist.last.where("length(s) = 1")
      .select("s").collect().map(_.getString(0)).toSet
    assert(finalSingles == seedSingles)
    // survivors' losses dominate the pruned pieces' (round 1, where the
    // kept set is hist.head's multi pieces) — ties at the boundary are
    // legal (the s tiebreak), so ≥ not >
    val losses = Unigram.pruneLossesSeed(types)
      .selectExpr("s", "cast(loss as double) AS loss").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val kept = hist.head.where("length(s) > 1")
      .select("s").collect().map(_.getString(0)).toSet
    val prunedL = losses.filterNot { case (s, _) => kept(s) }.values
    if (prunedL.nonEmpty) {
      val minKept = kept.map(losses).min
      assert(minKept >= prunedL.max,
        s"a pruned piece out-losses a kept one: minKept=$minKept maxPruned=${prunedL.max}")
    }
    // the final model still segments EVERY corpus word type (totality):
    // one row per type, no null score
    val seg = Unigram.prunedSegFor(spark, sf)
    assert(seg.count() == types.count())
    assert(seg.where("score_e6 IS NULL OR n_uni IS NULL").count() == 0)
  }

  test("n-best apply: lists equal exhaustive enumeration — best ≡ Viterbi, strict order, every path achievable") {
    // the top-3 packed lists against the DEFINITION: enumerate every
    // segmentation of each planted word, pack each path's (Σ e6 score,
    // token count) with the house convention, sort desc, take 3 — the
    // engine's list must match value for value (which simultaneously
    // pins best-of-n ≡ Viterbi, the strict ordering, and that nothing
    // unachievable ever enters the list)
    val types = Seq(("abab", 3L), ("aa", 2L), ("abcab", 1L), ("bcb", 2L))
      .toDF("w", "cnt")
    val counts = Unigram.seedCountsOf(types).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = counts.values.sum
    val se6 = counts.map { case (s, c) =>
      s -> math.round(1e6 * (math.log(c.toDouble) - math.log(tot.toDouble))) }
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(WordPiece.MaxPieceLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (!se6.contains(p)) Nil else segs(w.substring(l)).map(p +: _)
      }
    val Off = 1000000000000L
    def packedOf(seg: Seq[String]): Long =
      (seg.map(se6).sum + Off) * 1024 + (1023 - seg.length)
    val got = Unigram.nbestSeed(types).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val vit = Unigram.segCounts(types).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (w <- Seq("abab", "aa", "abcab", "bcb")) {
      val want = segs(w).map(packedOf).sorted.reverse.take(Unigram.NBest)
      assert(got(w) == want, s"n-best($w): ${got(w)} != $want")
      val (nUni, score) = vit(w)
      assert(1023 - got(w).head % 1024 == nUni,
        s"best-of-n token count diverged from Viterbi for $w")
      assert(got(w).head / 1024 - Off == score,
        s"best-of-n score diverged from Viterbi for $w")
    }
  }

  test("n-best coverage tracks ambiguity: the planted ambiguous type fills the list, a single char cannot") {
    // Kudo 2018 §4's regularization claim, made a measurable integer:
    // sampling coverage = how many distinct lattice paths the sampler
    // can draw — maximal for the planted ambiguous type, exactly one
    // for a single-char word, in between for a two-way split
    val types = Seq(("aaaa", 4L), ("q", 3L), ("qa", 2L)).toDF("w", "cnt")
    val sizes = Unigram.nbestSeed(types).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).size).toMap
    assert(sizes("aaaa") == Unigram.NBest,
      s"ambiguous type should fill the n-best list: ${sizes("aaaa")}")
    assert(sizes("q") == 1, s"single-char type has one path: ${sizes("q")}")
    assert(sizes("qa") == 2, s"two-way type has two paths: ${sizes("qa")}")
  }
}
