package graft

import graft.operators.CurationPipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Anomaly, Curation, Dedup}

/** Semantic properties of the round-4 curation/analysis operators that
  * the DuckDB hash gate can't express: coverage/overlap invariants for
  * chunking, banding recall vs brute force for SimHash pairs, and
  * exact-integer vs floating agreement for the anomaly test. */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, sf)

  test("textChunks covers every character and respects size/stride") {
    val chunks = Curation.textChunks(docs, size = 400, stride = 300)
    val byDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("start").as("last_start"),
      min("chunk_len").as("min_len"), max("chunk_len").as("max_len"))
      .join(docs.selectExpr("doc_id", "length(text) AS len"), "doc_id")
    // no chunk longer than size; every start on the stride grid; the last
    // window reaches the end of the doc (full coverage)
    assert(byDoc.where("max_len > 400").count() == 0)
    assert(chunks.where("(start - 1) % 300 != 0").count() == 0)
    assert(byDoc.where("last_start + 400 - 1 < len AND last_start + 300 <= len").count() == 0)
    // chunk count = ceil(len/stride) exactly, for every doc
    assert(byDoc.where("n != ceil(len / 300.0)").count() == 0)
  }

  test("ChunkGen matches the declarative substring spelling, including non-ASCII") {
    // a code-point-heavy doc where the ASCII fast path does NOT apply:
    // ChunkGen and SQL substring must still agree position-for-position
    val text = ("héllo wörld 😀 " * 40).trim
    val one = Seq((1L, text)).toDF("doc_id", "text")
    val gen = Curation.textChunks(one, size = 50, stride = 30)
    val sql = one
      .selectExpr("doc_id", "text", "sequence(1, length(text), 30) AS starts")
      .select(col("doc_id"), col("text"), posexplode(col("starts")).as(Seq("idx", "start")))
      .selectExpr("doc_id", "cast(idx as bigint) AS chunk_idx", "cast(start as bigint) AS start",
        "cast(length(substring(text, start, 50)) as bigint) AS chunk_len",
        "md5(substring(text, start, 50)) AS chunk_md5")
    assert(gen.exceptAll(sql).count() == 0 && sql.exceptAll(gen).count() == 0)
  }

  test("vocabTopK returns exactly k rows in (count desc, token asc) order") {
    val top = Curation.vocabTopK(docs, k = 20).collect()
    assert(top.length == 20)
    val pairs = top.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sliding(2).forall { case Array((c1, t1), (c2, t2)) =>
      c1 > c2 || (c1 == c2 && t1 < t2) })
  }

  test("tfidfTop ranks within each doc and never exceeds topPerDoc rows") {
    val t = Curation.tfidfTop(docs, topPerDoc = 3)
    val perDoc = t.groupBy("doc_id").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
    assert(perDoc.where("n > 3 OR maxrk > 3").count() == 0)
    // rank 1 really is the per-doc max score (ties impossible: tok is the tiebreak)
    val viol = t.where("rk = 1").toDF("doc_id", "tok1", "tf1", "df1", "s1", "rk1")
      .join(t, "doc_id").where("score_e6 > s1")
    assert(viol.count() == 0)
  }

  test("valueAnomalies integer test agrees with the floating z-score on real events") {
    val ev = Tables.events(spark, sf)
    val exact = Anomaly.valueAnomalies(ev, z = 3).select("event_id")
    val stats = ev.groupBy("event_type").agg(
      avg("value").as("m"), stddev_samp("value").as("sd"))
    val float = ev.join(stats, "event_type")
      .where("abs(value - m) > 3 * sd").select("event_id")
    // borderline cases (|z| within 1e-9 of 3) could legitimately differ;
    // on this data none sit on the boundary, so the sets must be equal
    assert(exact.exceptAll(float).count() == 0 && float.exceptAll(exact).count() == 0)
    assert(exact.count() > 0, "testdata has heavy-tailed values; expected anomalies")
  }

  test("PSI is near zero for identical halves and large under a planted shift") {
    import java.sql.Timestamp
    // identical value distribution in both time halves -> only the
    // add-one smoothing contributes, PSI ~ 0
    val flat = (0 until 1000).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), (i % 10) * 10.0)
    }.toDF("event_id", "ts", "value")
    val psiFlat = Anomaly.psiDrift(flat).select("psi_total_e9").head().getLong(0)
    assert(math.abs(psiFlat) < 1000000L, s"flat PSI was $psiFlat") // < 0.001
    // second half shifted to the top bucket -> PSI far above the 0.25
    // "significant drift" rule of thumb
    val shifted = (0 until 1000).map { i =>
      val v = if (i < 500) (i % 10) * 10.0 else 90.0
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), v)
    }.toDF("event_id", "ts", "value")
    val psiShift = Anomaly.psiDrift(shifted).select("psi_total_e9").head().getLong(0)
    assert(psiShift > 250000000L, s"shifted PSI was $psiShift")
  }

  test("split novelty is 0 for an eval doc copied from train and 10000 for alien content") {
    // choose ids landing in the right splits via the q12 hash
    val lbl = (id: Long) => spark.range(1).selectExpr(
      s"CASE WHEN (($id % 1000000007) * 2654435761 + 40503) % 10000 < 6400 THEN 'train' " +
      s"WHEN (($id % 1000000007) * 2654435761 + 40503) % 10000 < 8000 THEN 'validation' ELSE 'test' END")
      .head().getString(0)
    val trainId = (0L until 100L).find(lbl(_) == "train").get
    val evalIds = (0L until 100L).filter(lbl(_) != "train")
    val (copyId, alienId) = (evalIds.head, evalIds(1))
    val corpus = Seq(
      (trainId, "alpha beta gamma delta epsilon"),
      (copyId, "alpha beta gamma delta epsilon"), // pure train content
      (alienId, "zeta eta theta iota kappa")      // nothing shared
    ).toDF("doc_id", "text")
    val out = Curation.splitNovelty(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(copyId) == 0L)
    assert(out(alienId) == 10000L)
    assert(!out.contains(trainId))
  }

  test("source entropy: uniform vocabulary scores 1.0 normalized, constant token scores 0") {
    val corpus = Seq(
      (1L, "a b c d a b c d", "uniform"),   // 4 types × 2 — uniform
      (2L, "x x x x x x", "constant"),      // 1 type
      (3L, "y y y y y z", "skewed")
    ).toDF("doc_id", "text", "source")
    val out = Curation.sourceEntropy(corpus).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("uniform")._4 == 10000L) // H = ln(4) exactly
    assert(out("constant")._3 == 0L && out("constant")._4 == 0L) // single type
    val sk = out("skewed")
    assert(sk._2 == 2L && sk._3 > 0L && sk._4 < 10000L) // below uniform
  }

  test("crossDocDedup strikes planted boilerplate and reassembles byte-exactly") {
    val corpus = docs.selectExpr("doc_id",
      "CASE WHEN doc_id % 7 = 0 THEN concat('please subscribe to our newsletter today now dear reader ', text) ELSE text END AS text")
    val out = Curation.crossDocDedup(corpus)

    // every planted doc loses at least its two banner blocks
    val planted = out.where("doc_id % 7 = 0")
    assert(planted.where("n_removed < 2").count() == 0)
    assert(planted.count() > 0)

    // block accounting: n_blocks == ceil(tokens / 4)
    val counts = corpus.selectExpr("doc_id",
      "cast(ceil(size(split(trim(text), '\\\\s+')) / 4.0) as bigint) AS want")
      .join(out, "doc_id")
    assert(counts.where("n_blocks != want").count() == 0)

    // untouched docs reassemble to their exact original token stream
    val untouched = out.where("n_removed = 0")
      .join(corpus.selectExpr("doc_id",
        "md5(array_join(split(trim(text), '\\\\s+'), ' ')) AS orig_fp"), "doc_id")
    assert(untouched.count() > 0)
    assert(untouched.where("clean_fp != orig_fp").count() == 0)
  }

  test("quantileFilter keeps exactly the at-or-above-median docs per group, even and odd sizes") {
    val d = Seq(
      (1L, "x", 1L), (2L, "x", 2L), (3L, "x", 3L), (4L, "x", 4L), // median 2.5
      (5L, "y", 10L), (6L, "y", 20L), (7L, "y", 30L))             // median 20
      .toDF("doc_id", "lang", "n_chars")
    val kept = Curation.quantileFilter(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // x: med2x=5 keeps n_chars 3,4; y: med2x=40 keeps 20,30
    assert(kept.toSeq == Seq((3L, 5L), (4L, 5L), (6L, 40L), (7L, 40L)))
  }

  test("invertedIndex: exact df, capped sorted postings, (df desc, tok) order") {
    val d = Seq((1L, "a b"), (2L, "b c b"), (3L, "b")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.invertedIndex(d, cap = 2, topN = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // b in 3 docs (postings capped to first 2), then a before c by token order
    assert(out.toSeq == Seq(("b", 3L, "1,2"), ("a", 1L, "1")))
  }

  test("simhashPairs equals the brute-force Hamming join (banding is exact, not probabilistic)") {
    val sigs = Dedup.simhash(docs)
    val brute = sigs.toDF("doc_a", "sim_a")
      .join(sigs.toDF("doc_b", "sim_b"), col("doc_a") < col("doc_b"))
      .selectExpr("doc_a", "doc_b", "cast(bit_count(sim_a ^ sim_b) as bigint) AS hamming")
      .where("hamming <= 3")
    val banded = Dedup.simhashPairs(docs, maxHam = 3)
    assert(banded.exceptAll(brute).count() == 0 && brute.exceptAll(banded).count() == 0)
    assert(banded.count() > 0)
  }

  test("curation pipeline: stages only remove, survivors respect every stage's gate") {
    val surv = CurationPipeline.survivors(docs).cache()
    val n = surv.count()
    assert(n > 0 && n < docs.count(), "pipeline must keep some and drop some")
    // survivors carry no duplicate content (stage 1)
    assert(surv.select("text").distinct().count() == n)
    // every survivor passes the quality gate's cheapest invariant (stage 2)
    assert(surv.where(
      "size(split(trim(text), '\\\\s+')) < 5").isEmpty)
    // no survivor is an eval doc (stage 3 removes the slice itself)
    assert(surv.where("doc_id % 97 = 3").isEmpty)
    // per-source cap holds (stage 4)
    assert(surv.groupBy("source").count().where("count > 15").isEmpty)
    // the summary conserves the survivors' docs and tokens
    val summary = CurationPipeline.curate(docs)
    val (sd, st) = summary.agg(sum("n_docs"), sum("n_tokens"))
      .as[(Long, Long)].head()
    assert(sd == n)
    val tot = surv.selectExpr(
      "cast(size(split(trim(text), '\\\\s+')) as bigint) AS t")
      .agg(sum("t")).as[Long].head()
    assert(st == tot)
    surv.unpersist()
  }

  test("DSIR selection keeps ~keepPct% and enriches the target language") {
    val out = Curation.dsirWeights(docs).cache()
    val n = out.count()
    val kept = out.where("keep").count()
    // percentile cut ⇒ kept fraction ≈ keepPct (ties can only widen it)
    assert(kept >= n / 5 && kept <= n * 2 / 5,
      s"top-quartile cut kept $kept of $n")
    // the kept set must be en-ENRICHED: P(en | kept) > P(en) overall —
    // the whole point of importance resampling toward an en target
    val withLang = out.join(docs.select("doc_id", "lang"), "doc_id")
    val baseEn = withLang.where("lang = 'en'").count().toDouble / n
    val keptEn = withLang.where("keep AND lang = 'en'").count().toDouble / kept
    assert(keptEn > baseEn + 0.2,
      f"kept-set en share $keptEn%.2f vs base $baseEn%.2f — no enrichment")
    // per-ngram score is the exact floor of the ratio, for every doc
    assert(out.where(
      "spb_e4 != cast(floor(logw_e6 / (n_ngrams * 1e2)) as bigint)").isEmpty)
    out.unpersist()
  }

  test("DSIR AUC gate: tie-aware Mann-Whitney equals the definition and clears its floor") {
    val row = Curation.dsirAuc(docs).head()
    val (np, nn, auc) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(row.getBoolean(3), s"AUC floor failed: $auc")
    // cross-check against the O(n²) pairwise definition on the small SF:
    // AUC = (#concordant + #ties/2) / (Np·Nn)
    val sc = Curation.dsirWeights(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .selectExpr("lang = 'en' AS pos", "spb_e4")
    val pairs = sc.where("pos").crossJoin(
        sc.where("NOT pos").selectExpr("spb_e4 AS s_neg"))
    val (conc, ties) = (
      pairs.where("spb_e4 > s_neg").count(),
      pairs.where("spb_e4 = s_neg").count())
    val expected = (1000000L * (2 * conc + ties)) / (2 * np * nn)
    assert(auc == expected, s"bucketed AUC $auc != pairwise $expected")
  }

  test("domain reweighting: a planted high-KL source outranks its uniform share; budget conserves") {
    import spark.implicits._
    // 4 sources drawn from the same vocabulary + one source speaking a
    // DIFFERENT language entirely (maximal KL vs the corpus mix)
    val common = (1 to 50).map(i => s"tok${i % 7}").mkString(" ")
    val alien = (1 to 50).map(i => s"zz${i % 7}").mkString(" ")
    val docs = (0 until 40).map { i =>
      val src = s"s${i % 5}"
      (i.toLong, if (i % 5 == 4) alien else common, src)
    }.toDF("doc_id", "text", "source")
    val out = Curation.domainReweight(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSeq
    val total = out.map(_._3).sum
    assert(total == 10000L, s"budget must conserve exactly, got $total")
    val byKl = out.sortBy(-_._2)
    assert(byKl.head._1 == "s4", s"the alien source must carry the max KL: $byKl")
    assert(byKl.head._3 > 2000L,
      s"the alien source must beat its uniform share (2000): ${byKl.head}")
    // the four identical sources tie exactly (same distribution)
    assert(out.filter(_._1 != "s4").map(_._2).distinct.size == 1,
      "identical sources must carry identical KL")

    // the exponentiated sibling (q187) on the same plant: budget
    // conserves, the alien source's multiplicative upweight EXCEEDS the
    // linearized one (exp(x) > 1 + x for x > 0), and the 1% uniform
    // smoothing keeps every source alive
    val exp = Curation.domainReweightExp(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(6))).toSeq
    assert(exp.map(_._3).sum == 10000L, "exp-update budget must conserve")
    val linAlien = out.find(_._1 == "s4").get._3
    val expAlien = exp.find(_._1 == "s4").get._3
    assert(expAlien > linAlien,
      s"multiplicative weights must upweight the outlier past the linearization ($expAlien vs $linAlien)")
    assert(exp.forall(_._3 > 0L), "uniform smoothing must keep every source alive")
  }

  test("DoReMi round 2: the re-fit reference under-serves the ordinary domains, and weight moves back to them") {
    import spark.implicits._
    // round 1 over the q187 plant upweights the alien source to near
    // the whole budget; the ROUND-2 reference (the α-weighted mixture)
    // therefore speaks mostly alien — the ordinary sources are the
    // ones the new reference under-serves, so the second multiplicative
    // update must swing weight back toward them (the oscillation
    // DoReMi's averaged rounds exist to damp, witnessed exactly)
    val common = (1 to 50).map(i => s"tok${i % 7}").mkString(" ")
    val alien = (1 to 50).map(i => s"zz${i % 7}").mkString(" ")
    val docs = (0 until 40).map { i =>
      val src = s"s${i % 5}"
      (i.toLong, if (i % 5 == 4) alien else common, src)
    }.toDF("doc_id", "text", "source")
    val r1 = Curation.domainReweightExp(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(5), r.getLong(6))).toMap // (alpha_e6, alloc)
    val r2 = Curation.domainReweightRound2(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(2), r.getLong(6), r.getLong(7)))
      .toMap // (alpha_e6[r1 echo], kl2_e9, alpha2_e6, alloc)
    // budget conserves exactly, and the echoed round-1 alpha matches
    assert(r2.values.map(_._4).sum == 10000L, "round-2 budget must conserve")
    for (s <- r1.keys) assert(r2(s)._1 == r1(s)._1,
      s"round-2 must consume round 1's alpha for $s")
    // the re-fit reference serves the alien source and under-serves the
    // ordinary ones: KL2(ordinary) > KL2(alien)
    val kl2Alien = r2("s4")._2
    val kl2Ord = r2("s0")._2
    assert(kl2Ord > kl2Alien,
      s"the round-2 reference must under-serve the ordinary domains (kl2 s0=$kl2Ord s4=$kl2Alien)")
    // and the update moves weight toward them: ordinary alphas rise,
    // the alien alpha falls, round 1 → round 2
    assert(r2("s0")._3 > r1("s0")._1,
      s"round 2 must upweight the under-served domain (${r2("s0")._3} vs ${r1("s0")._1})")
    assert(r2("s4")._3 < r1("s4")._1,
      s"round 2 must downweight the over-served domain (${r2("s4")._3} vs ${r1("s4")._1})")
  }
}
