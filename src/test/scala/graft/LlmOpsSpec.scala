package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Relational, Similarity, TextAnalysis}

/** Semantic properties of the LLM-data operators that the DuckDB oracle
  * can't express: LSH recall against brute force, SimHash distance
  * separation, ANN bucket sanity. */
class LlmOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, sf)

  /** Brute-force word-2gram Jaccard pairs (the ground truth LSH must recall). */
  lazy val brutePairs: Set[(Long, Long, Long)] = {
    val sh = Dedup.shingled(docs)
    sh.toDF("doc_a", "sh_a").crossJoin(sh.toDF("doc_b", "sh_b"))
      .where(col("doc_a") < col("doc_b"))
      .selectExpr("doc_a", "doc_b",
        "cast(round(1000.0 * size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))) as bigint) AS j1000")
      .where("j1000 >= 500")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("minhash LSH recalls every strong (j >= 0.9) brute-force near-dup pair") {
    val strong = brutePairs.filter(_._3 >= 900)
    assert(strong.nonEmpty, "testdata should contain planted near-dups")
    val lsh = Dedup.minhashNearDups(docs).as[(Long, Long, Long)].collect().toSet
    val missed = strong -- lsh
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }

  test("near-dup clusters are transitive: a chain A~B~C collapses to ONE representative") {
    // three near-identical docs forming a chain (A and C differ more from
    // each other than either does from B) + one unrelated doc
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val chain = Seq(
      (10L, base + " alpha beta"),
      (20L, base + " alpha gamma"),
      (30L, base + " delta gamma"),
      (99L, (1 to 60).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(chain)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // all three chain docs labeled with the min id, only doc 10 kept
    assert(clusters(10L) == ((10L, true)))
    assert(clusters(20L) == ((10L, false)))
    assert(clusters(30L) == ((10L, false)))
    assert(!clusters.contains(99L)) // not in any pair -> not in the graph
  }

  test("pointer-jumped clustering collapses a planted 10-chain in O(log d) rounds") {
    // sliding 100-token windows, step 3: adjacent docs' shingle Jaccard
    // ≈ 941‰ (edge at threshold 900), two-apart ≈ 886‰ (no shortcut
    // edge) — a genuine diameter-9 chain. Plain hash-min needs ~10
    // rounds; the pointer-jump shortcut must finish in ≲ log₂(9)+2.
    val toks = (0 until 127).map(i => f"ct$i%03d")
    val chain = (0 until 10).map { i =>
      ((i + 1).toLong, toks.slice(i * 3, i * 3 + 100).mkString(" "))
    }.toDF("doc_id", "text")
    val (clusters, iters) = Dedup.nearDupClustersStats(chain, thresholdPerMille = 900)
    val m = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 10 && (1L to 10L).forall(m(_) == 1L), s"clusters: $m")
    assert(iters <= 6, s"took $iters rounds for a 10-chain — pointer jumping not effective")
  }

  test("near-dup clusters on a clean corpus (no pairs) return an empty frame, not an NPE") {
    // every doc unique: no near-dup pairs, labels frame is empty, and the
    // convergence aggregate is NULL — must come back empty, never throw
    val clean = (1 to 5).map(i => (i.toLong, (1 to 40).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(clean)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("doc_id", "cluster", "keep"))
  }

  test("native MinHashSig expression is bit-identical to the declarative SQL path") {
    val native = Dedup.signatures(docs).drop("sh").orderBy("doc_id")
    val sql = Dedup.signaturesSql(docs).drop("sh").orderBy("doc_id")
    assert(native.except(sql).count() == 0 && sql.except(native).count() == 0)
    assert(native.count() == sql.count())
  }

  test("minhash LSH reports no false positives above threshold") {
    val lsh = Dedup.minhashNearDups(docs).as[(Long, Long, Long)].collect().toSet
    // every reported pair must be a true >= 0.5 Jaccard pair (exact
    // confirmation step guarantees this; guard against regressions)
    assert((lsh -- brutePairs).isEmpty)
  }

  test("incremental dedup equals batch-restricted full recompute; old×old pairs never emitted") {
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    def doc(id: Long, tail: String) = (id, s"$filler $tail")
    // old slice: 1~2 are near-dups of each other (the pair incremental
    // must NOT re-find), 3 seeds a cross pair, 4 is unrelated
    val oldDocs = Seq(
      doc(1L, "alpha beta"), doc(2L, "alpha gamma"), doc(3L, "kappa mu"),
      (4L, (1 to 60).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    // new batch: 17 ~ old 3 (cross), 27 ~ 37 (within-batch), 47 unrelated
    val newDocs = Seq(
      doc(17L, "kappa nu"), doc(27L, "sigma tau"), doc(37L, "sigma phi"),
      (47L, (1 to 60).map(i => s"y$i").mkString(" "))).toDF("doc_id", "text")
    // persist the old slice's index, then plan ONLY against the files
    val idx = java.nio.file.Files.createTempDirectory("graft_lsh_inc").toString
    val sigs = Dedup.signatures(oldDocs)
    Dedup.bandedOf(sigs).write.parquet(s"$idx/bands")
    sigs.select("doc_id", "sh").write.parquet(s"$idx/sh")
    val inc = Dedup.incrementalNearDups(
      spark.read.parquet(s"$idx/bands"), spark.read.parquet(s"$idx/sh"), newDocs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // ground truth: full-corpus pairs restricted to those touching the batch
    val newIds = Set(17L, 27L, 37L, 47L)
    val full = Dedup.minhashNearDups(oldDocs.unionAll(newDocs))
      .as[(Long, Long, Long)].collect().toSet
    val expected = full.collect { case (a, b, j) if newIds(a) || newIds(b) =>
      (a, b, j, newIds(a) != newIds(b)) }
    assert(full.exists { case (a, b, _) => !newIds(a) && !newIds(b) },
      "corpus must contain an old×old pair for the exclusion to be meaningful")
    assert(inc == expected, s"incremental=$inc expected=$expected")
    assert(inc.exists(p => p._4), "planted cross pair (3,17) missing")
    assert(inc.exists(p => !p._4), "planted within-batch pair (27,37) missing")
    assert(!inc.exists { case (a, b, _, _) => !newIds(a) && !newIds(b) },
      "incremental emitted an old×old pair")
  }

  test("cluster-keyed split never separates a near-dup pair; the doc-keyed split does on this corpus") {
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    // ids 1 and 3 are near-dups chosen so the DOC-level hash split would
    // place them in different splits — the leakage q123 exists to prevent
    val corpus = Seq(
      (1L, s"$filler alpha beta"), (3L, s"$filler alpha gamma"),
      (10L, (1 to 60).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val docSplits = corpus.select(col("doc_id"),
      Relational.splitLabel(col("doc_id")).as("split"))
      .as[(Long, String)].collect().toMap
    assert(docSplits(1L) != docSplits(3L),
      "precondition: the planted pair must straddle doc-level splits")
    val labels = Dedup.nearDupClusters(corpus).select("doc_id", "cluster")
    val split = corpus.select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("split", Relational.splitLabel(col("cluster")))
    val crossPairs = Dedup.minhashNearDups(corpus)
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .where("sa <> sb").count()
    assert(crossPairs == 0, "cluster-keyed split leaked a near-dup pair across splits")
    // singletons keep the doc-level assignment (cluster = own id)
    val s10 = split.where("doc_id = 10").select("split").as[String].head()
    assert(s10 == docSplits(10L))
  }

  test("fuzzy decontamination catches perturbed eval copies that exact-hash dedup misses") {
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val evalDoc = (100L, s"$filler secret eval answer")
    // the leak: first token rewritten — different exact hash, nearly all
    // shingles intact (J ≈ 0.93; well inside the 4×4 banding's s-curve —
    // a heavier ~0.55-Jaccard paraphrase sits below its reliable recall,
    // which is the documented threshold trade of q22's banding shape)
    val leakedText = ("zzz" +: evalDoc._2.split("\\s+").drop(1)).mkString(" ")
    val corpus = Seq((1L, s"${(1 to 60).map(i => s"x$i").mkString(" ")} unrelated"),
      (2L, leakedText)).toDF("doc_id", "text")
    val evalDf = Seq(evalDoc).toDF("doc_id", "text")
    assert(corpus.selectExpr("md5(text) AS h").intersect(
      evalDf.selectExpr("md5(text) AS h")).isEmpty,
      "precondition: the leak is invisible to exact-hash dedup")
    val sigs = Dedup.signatures(evalDf)
    val flagged = Dedup.incrementalNearDups(
      Dedup.bandedOf(sigs), sigs.select("doc_id", "sh"), corpus)
      .where("is_cross").selectExpr("CASE WHEN doc_a = 100 THEN doc_b ELSE doc_a END AS d", "j1000")
      .as[(Long, Long)].collect().toMap
    assert(flagged.contains(2L) && flagged(2L) >= 500, s"leak not flagged: $flagged")
    assert(!flagged.contains(1L), "unrelated doc falsely flagged")
  }

  test("simhash separates near-dups from random pairs by hamming distance") {
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val nearPairs = brutePairs.filter(_._3 >= 900).toSeq.map(p => (p._1, p._2))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearMean = nearPairs.map { case (a, b) => hamming(sh(a), sh(b)) }.sum.toDouble / nearPairs.size
    val rng = new scala.util.Random(42)
    val ids = sh.keys.toArray
    val randMean = (1 to 200).map { _ =>
      hamming(sh(ids(rng.nextInt(ids.length))), sh(ids(rng.nextInt(ids.length))))
    }.sum / 200.0
    assert(nearMean < randMean / 2, s"near=$nearMean rand=$randMean")
  }

  test("cosine top-k returns k descending neighbors per query, sims in [-1,1]") {
    val rows = Similarity.cosineTopK(Tables.embeddings(spark, sf))
      .orderBy("query_id", "rank").collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.values.foreach { rs =>
      assert(rs.length == 5)
      val sims = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
      assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    }
  }

  test("hard-negative mining: negatives are cross-label, ranked, and semi_hard agrees with pos_sim") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.hardNegatives(emb).cache()
    val labels = emb.selectExpr("vec_id", "label AS l")
    // every mined negative really has a different label than its anchor
    val crossed = out
      .join(labels.toDF("query_id", "al"), "query_id")
      .join(labels.toDF("neg_id", "nl"), "neg_id")
    assert(crossed.where("al = nl").isEmpty, "a same-label 'negative' leaked")
    // the flag is exactly the comparison it claims to be
    assert(out.where("semi_hard != (sim < pos_sim)").isEmpty)
    // ranks are contiguous 1..k per anchor, sims descending
    val byQ = out.orderBy("query_id", "rank").collect().groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).toSeq == (1L to rs.length))
      val sims = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
    out.unpersist()
  }

  test("every vector lands in exactly one of the 256 LSH buckets") {
    val b = Similarity.lshBuckets(Tables.embeddings(spark, sf))
    assert(b.count() == Tables.embeddings(spark, sf).count())
    val range = b.agg(min("bucket"), max("bucket")).collect()(0)
    assert(range.getLong(0) >= 0L && range.getLong(1) <= 255L)
  }

  test("banded LSH: exact duplicates collide in every band; candidate volume is a small fraction of all pairs") {
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val pairs = Similarity.lshCandidatesBanded(e)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // union across bands is deduped — each pair at most once
    assert(pairs.distinct.length == pairs.length)
    // corpus-scaled bits keep the candidate set far below all-pairs
    assert(pairs.length < n * (n - 1) / 2 / 10,
      s"${pairs.length} candidates for $n vectors — bucket join degenerating toward all-pairs")
    // a planted exact duplicate has identical dot signs in every band, so
    // it MUST surface as a candidate with cosine exactly 1.0
    val base = e.orderBy("vec_id").limit(1)
    val dup = base.selectExpr("100001L AS vec_id", "embedding")
      .unionByName(base.selectExpr("100002L AS vec_id", "embedding"))
    val withDup = e.select("vec_id", "embedding").unionByName(dup)
    val hit = Similarity.lshCandidatesBanded(withDup)
      .where("vec_a = 100001 AND vec_b = 100002").collect()
    assert(hit.length == 1 && hit(0).getDouble(2) == 1.0)
  }

  test("native JaccardMille is bit-identical to the declarative set expression") {
    val sh = Dedup.shingled(docs)
    val pairs = sh.toDF("a_id", "sh_a").crossJoin(sh.toDF("b_id", "sh_b"))
      .where("a_id < 30 AND b_id >= 30 AND b_id < 90")
    val native = pairs.select(col("a_id"), col("b_id"),
      Dedup.jaccardN(col("sh_a"), col("sh_b")).as("j"))
    val sql = pairs.selectExpr("a_id", "b_id", s"${Dedup.jaccardE("sh_a", "sh_b")} AS j")
    assert(native.exceptAll(sql).count() == 0 && sql.exceptAll(native).count() == 0)
    // duplicate-bearing inputs still follow set semantics
    val dup = Seq((Seq("x", "x", "y"), Seq("y", "z", "z"))).toDF("a", "b")
    assert(dup.select(Dedup.jaccardN(col("a"), col("b"))).collect()(0).getLong(0) == 333L)
  }

  test("native CharShingles is bit-identical to the declarative transform on its guarded domain") {
    import org.apache.spark.sql.graft.ColumnBridge
    val d = docs.where("length(text) >= 5").limit(100)
    val native = d.select(col("doc_id"), ColumnBridge.column(
      graft.plans.CharShingles(ColumnBridge.expression(col("text")), 5)).as("g"))
    val sql = d.selectExpr("doc_id",
      "array_distinct(transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))) AS g")
    // exact arrays including element ORDER (first occurrence), not just sets
    assert(native.exceptAll(sql).count() == 0 && sql.exceptAll(native).count() == 0)
    // short input: empty array (documented divergence from sequence(1,0)=[1,0])
    val short = Seq("abc").toDF("text").select(ColumnBridge.column(
      graft.plans.CharShingles(ColumnBridge.expression(col("text")), 5)).as("g"))
    assert(short.selectExpr("size(g)").collect()(0).getInt(0) == 0)
    // code points, not UTF-16 chars: a supplementary char is ONE position
    val sup = Seq("a😀bcd").toDF("text") // a😀bcd = 5 code points
    val g = sup.select(ColumnBridge.column(
      graft.plans.CharShingles(ColumnBridge.expression(col("text")), 5)).as("g"))
      .selectExpr("g", "element_at(g, 1) AS first")
    val row = g.collect()(0)
    assert(row.getSeq[String](0).length == 1 && row.getString(1) == "a😀bcd")
    // SQL substring agrees on the same input (the parity that matters)
    val sqlSup = sup.selectExpr(
      "array_distinct(transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))) AS g")
    assert(g.select("g").exceptAll(sqlSup).count() == 0)
  }

  test("native SimHashSig is bit-identical to the declarative 48-pass aggregate") {
    val native = Dedup.simhash(docs)
    val declarative = Dedup.simhashDeclarative(docs)
    assert(native.exceptAll(declarative).count() == 0 &&
           declarative.exceptAll(native).count() == 0)
    // duplicate tokens vote once (array_distinct semantics)
    val dup = Seq(("a a a b", 1L)).toDF("text", "doc_id")
    val one = Seq(("a b", 1L)).toDF("text", "doc_id")
    assert(Dedup.simhash(dup).select("simhash").collect()(0).getLong(0) ==
           Dedup.simhash(one).select("simhash").collect()(0).getLong(0))
  }

  test("native CosineSim is bit-identical to the declarative fold") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v")
    val pairs = e.toDF("a_id", "a").crossJoin(e.toDF("b_id", "b"))
      .where("a_id < 20 AND b_id BETWEEN 20 AND 60")
    val native = pairs.select(col("a_id"), col("b_id"),
      Similarity.cosineN(col("a"), col("b")).as("s"))
    val sql = pairs.selectExpr("a_id", "b_id", s"${Similarity.cosineE("a", "b")} AS s")
    // raw doubles, no rounding: the folds must agree to the last bit
    assert(native.exceptAll(sql).count() == 0 && sql.exceptAll(native).count() == 0)
  }

  test("IVF with nprobe=k is exactly brute force; nprobe=4 keeps useful recall") {
    val e = Tables.embeddings(spark, sf)
    val (cents, asg) = Similarity.ivfIndex(e, k = 16, iters = 2)
    // every vector in exactly one inverted list
    assert(asg.count() == e.count())
    assert(asg.select("vec_id").distinct().count() == e.count())
    // searching all lists ≡ brute force
    val all = Similarity.ivfSearch(e, cents, asg, nprobe = 16)
    val brute = Similarity.cosineTopK(e)
    assert(all.except(brute).count() == 0 && brute.except(all).count() == 0)
    // probing 4/16 lists still recalls a useful share of true neighbors
    val probed = Similarity.ivfSearch(e, cents, asg, nprobe = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = brute.select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (probed intersect bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.2, s"recall@5 with nprobe=4 was $recall")
  }

  test("bm25: tf and idf move scores the right way; top-k is a distributed TakeOrdered") {
    // planted corpus: 'rare' appears in 2 docs, 'common' in all 6.
    // Doc 1 has rare twice, doc 2 once (same length) — tf monotonicity.
    // Doc 3 (common only) must score below any rare-matching doc — idf.
    val docs = Seq(
      (1L, "rare rare common aa bb cc dd ee"),
      (2L, "rare xx common aa bb cc dd ee"),
      (3L, "common yy zz aa bb cc dd ee"),
      (4L, "common y2 z2 aa bb cc dd ee"),
      (5L, "common y3 z3 aa bb cc dd ee"),
      (6L, "common y4 z4 aa bb cc dd ee")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("rare", "common"), topK = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).take(2).toSeq == Seq(1L, 2L),
      s"tf/idf ordering broken: ${out.toSeq}")
    val byDoc = out.map(t => t._2 -> t._3).toMap
    assert(byDoc(1L) > byDoc(2L), "higher tf must outrank at equal dl")
    assert(byDoc(2L) > byDoc(3L), "a rare-term match must outrank common-only")
    assert(out.map(_._1).toSeq == (1L to 6L), "ranks must be dense from 1")
    // plan shape: distributed heap top-k, not a global sort
    val plan = TextAnalysis.bm25TopK(docs, Seq("rare"), topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$plan")
  }

  test("sequence packing: no sequence exceeds the budget, all but the last per shard are exactly full, tokens conserved") {
    import graft.operators.Packing
    val plan = Packing.packSequences(docs).cache()
    try {
      val perSeq = plan.groupBy("shard", "seq_id").agg(sum("seg_tokens").as("n"))
      assert(perSeq.where(s"n > ${Packing.DefaultBudget}").count() == 0)
      // every sequence except each shard's last is exactly full
      val lastSeq = plan.groupBy("shard").agg(max("seq_id").as("last_seq"))
      val notFull = perSeq.join(lastSeq, "shard")
        .where(s"seq_id < last_seq AND n != ${Packing.DefaultBudget}")
      assert(notFull.count() == 0)
      // no token lost or duplicated by the overlap arithmetic
      val packed = plan.agg(sum("seg_tokens")).collect()(0).getLong(0)
      val source = docs.selectExpr(s"cast(size(${graft.functions.Portable.sparkToks}) as bigint) AS n")
        .agg(sum("n")).collect()(0).getLong(0)
      assert(packed == source)
      // deterministic: same input -> same plan
      assert(Packing.packSequences(docs).except(plan).count() == 0)
    } finally plan.unpersist()
  }

  test("semantic dedup drops the larger-id twin cluster-locally, keeps cross-cluster copies") {
    val e = Array.fill(64)(0.5f)
    val o = Array.tabulate(64)(i => if (i % 2 == 0) 0.5f else -0.5f) // orthogonal to e
    // vecs 1,2 identical (cluster 0); 3 orthogonal (cluster 0);
    // 4 = another copy of e but in cluster 1 → cluster-locality keeps it
    val emb = Seq((1L, e.toSeq), (2L, e.toSeq), (3L, o.toSeq), (4L, e.toSeq))
      .toDF("vec_id", "embedding")
    val asg = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)).toDF("vec_id", "cid")
    val out = Similarity.semanticDedup(emb, asg, tauE6 = 950000L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true), s"got $out")
  }

  test("corpus-derived IVF parameters: bounds, monotonicity, sample cap") {
    import graft.functions.Portable.{ivfK, ivfNprobe, ivfTrainMod}
    // k ≈ the power of two >= sqrt(n), clamped to [16, 65536]; probe
    // budget 3k/4; train sample ~256 vectors/centroid past the floor.
    // Sweep the decision boundaries + huge n (overflow guard).
    val ns = Seq(1L, 2L, 17L, 256L, 257L, 500L, 2000L, 60000L,
      1000000L, 1000000000L, 1L << 40, Long.MaxValue / 2)
    for (n <- ns) {
      val k = ivfK(n)
      assert(k >= 16 && k <= 65536, s"k=$k out of clamp at n=$n")
      if (k < 65536 && n > 257)
        assert(k.toLong * k >= n - 1, s"k=$k below sqrt at n=$n")
      if (k > 16 && k < 65536)
        assert(k.toLong * k / 4 < n, s"k=$k above 2*sqrt at n=$n")
      assert(ivfNprobe(k) == math.max(1, 3 * k / 4))
      val tm = ivfTrainMod(n, k)
      assert(tm >= 3, s"train modulus floor broken at n=$n")
      // past the floor the sample lands in [256k, 512k) vectors
      if (tm > 3) {
        val sample = n / tm
        assert(sample >= 200L * k && sample <= 520L * k,
          s"sample $sample not ~256/centroid at n=$n k=$k tm=$tm")
      }
    }
    // monotone in n (a bigger corpus never gets a narrower index)
    assert(ns.sorted.map(ivfK).sliding(2).forall(p => p.head <= p.last))
    // the three SFs' actual counts land where the verified oracles ran
    assert(ivfK(500) == 32 && ivfK(2000) == 64)
  }

  test("incremental ANN assignment plans against the persisted index, never the base embeddings") {
    val df = SparkEntry.queries("q161_ann_incremental")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val embScans = "embeddings\\.parquet".r.findAllIn(plan).size
    assert(embScans == 1, s"expected exactly 1 embeddings scan (the new batch), got $embScans in:\n$plan")
    assert(plan.contains("graft-store:ivf_idx"),
      "base assignments must come from the persisted store-backed index")
    // and the result is the full corpus, each vector exactly once
    val n = Tables.embeddings(spark, sf).count()
    assert(df.count() == n && df.select("vec_id").distinct().count() == n)
  }

  test("BPE-budget packing conserves the trained tokenizer's token count exactly") {
    import graft.operators.{Bpe, Packing}
    val counts = Bpe.bpeTokenCounts(docs, k = 3)
      .selectExpr("doc_id", "n_bpe_tokens AS n_toks").cache()
    val plan = Packing.packSequencesBy(counts).cache()
    try {
      val perSeq = plan.groupBy("shard", "seq_id").agg(sum("seg_tokens").as("n"))
      assert(perSeq.where(s"n > ${Packing.DefaultBudget}").count() == 0)
      val lastSeq = plan.groupBy("shard").agg(max("seq_id").as("last_seq"))
      assert(perSeq.join(lastSeq, "shard")
        .where(s"seq_id < last_seq AND n != ${Packing.DefaultBudget}").count() == 0)
      // conservation in the BPE domain: packed tokens = tokenizer's count
      val packed = plan.agg(sum("seg_tokens")).head().getLong(0)
      val source = counts.agg(sum("n_toks")).head().getLong(0)
      assert(packed == source, s"packed $packed != tokenized $source")
    } finally { plan.unpersist(); counts.unpersist() }
  }

  test("temperature mixture conserves the budget exactly and flattens the spread") {
    import graft.operators.Curation
    val m = Curation.temperatureMixture(docs, budget = 10000L).collect()
    assert(m.map(_.getLong(4)).sum == 10000L, "largest-remainder must conserve the budget")
    // α = 0.3 flattens: the allocation ratio between the extreme
    // sources must be strictly smaller than their token-count ratio
    val byTok = m.sortBy(_.getLong(1))
    val (lo, hi) = (byTok.head, byTok.last)
    assert(hi.getLong(4).toDouble / lo.getLong(4) <
      hi.getLong(1).toDouble / lo.getLong(1),
      "temperature sampling must flatten relative to proportional")
  }

  test("shard manifest conserves docs and tokens and is shuffle-order-invariant") {
    import graft.operators.Packing
    val m = Packing.shardManifest(docs, shards = 8).cache()
    val (nDocs, nToks) = m.agg(sum("n_docs"), sum("n_tokens"))
      .as[(Long, Long)].head()
    assert(nDocs == docs.count(), "every doc lands in exactly one shard")
    val totalToks = docs.selectExpr(
      "cast(size(split(trim(text), '\\\\s+')) as bigint) AS t")
      .agg(sum("t")).as[Long].head()
    assert(nToks == totalToks, "token totals conserved across shards")
    assert(m.where("shard < 0 OR shard >= 8").isEmpty)
    // the XOR checksum (and everything else) must not depend on
    // partitioning or shuffle order — re-layout the input and compare
    val m2 = Packing.shardManifest(docs.repartition(7), shards = 8)
    assert(m.exceptAll(m2).isEmpty && m2.exceptAll(m).isEmpty)
    m.unpersist()
    // plan pin: one data shuffle (partial → final aggregate); anything
    // more means the manifest stopped being a single-pass aggregate
    assert(SparkTestSession.shuffles(Packing.shardManifest(docs, 8)) <= 1)
  }

  test("stratified sampling is deterministic and respects per-stratum rates") {
    import graft.operators.Curation
    val s1 = Curation.stratifiedSample(docs).collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Curation.stratifiedSample(docs).collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2 && s1.nonEmpty)
    // every long doc kept; kept share of each stratum ≈ its rate (hash
    // uniformity over the portable md5-48, generous tolerance)
    val kept = Curation.stratifiedSample(docs).groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.selectExpr(
      "CASE WHEN length(text) >= 2000 THEN 'long' WHEN length(text) >= 500 THEN 'mid' ELSE 'short' END AS stratum")
      .groupBy("stratum").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("long", 0L) == all.getOrElse("long", 0L)) // 100% stratum fully kept
    Seq("mid" -> 0.50, "short" -> 0.25).foreach { case (st, rate) =>
      all.get(st).filter(_ >= 50).foreach { n =>
        val share = kept.getOrElse(st, 0L).toDouble / n
        assert(math.abs(share - rate) < 0.2, s"$st kept $share of $n at rate $rate")
      }
    }
  }

  test("mixture allocation sums exactly to the budget, each source within 1 of its proportional share") {
    import graft.operators.Curation
    val rows = Curation.mixtureAllocation(docs, budget = 10000L).collect()
    assert(rows.map(_.getLong(2)).sum == 10000L)
    val total = rows.map(_.getLong(1)).sum.toDouble
    rows.foreach { r =>
      val exact = 10000L * r.getLong(1) / total
      assert(math.abs(r.getLong(2) - exact) <= 1.0,
        s"source ${r.getLong(0)}: alloc ${r.getLong(2)} vs exact $exact")
    }
  }

  test("decontamination flags exactly the planted eval copies") {
    val out = SparkEntry.queries("q62_decontaminate")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // eval docs themselves are excluded from the train output
    assert(out.keys.forall(_ % 97 != 3))
    // every planted copy (+3e6 of an eval doc with >=6 tokens) is flagged
    val planted = docs.where("doc_id % 97 = 3")
      .selectExpr("doc_id + 3000000 AS doc_id", s"size(${graft.functions.Portable.sparkToks}) AS n")
      .collect().filter(_.getInt(1) >= 6).map(_.getLong(0))
    assert(planted.nonEmpty && planted.forall(out(_)))
  }

  test("bloom decontamination equals the plain anti-join and prunes map-side") {
    import graft.operators.Curation
    val d = docs.select("doc_id", "text")
    val evalDocs = d.where("doc_id % 97 = 3")
    val train = d.where("doc_id % 97 != 3").unionByName(
      evalDocs.selectExpr("doc_id + 3000000 AS doc_id", "text"))

    // exactness: the prefiltered path is byte-identical to the anti-join
    val got = Curation.bloomDecontaminate(train, evalDocs)
      .collect().map(_.getLong(0)).sorted.toSeq
    val fpE = s"${graft.functions.Portable.sparkHash48("text")} AS fp"
    val want = train.selectExpr("doc_id", fpE)
      .join(evalDocs.selectExpr(fpE), Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)

    // every planted copy is gone, clean rows survive
    val planted = evalDocs.selectExpr("doc_id + 3000000 AS doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty && got.forall(id => !planted.contains(id)))

    // the scale claim: the bloom admits only the candidate sliver —
    // true matches plus ~fpp of the clean corpus — so the exact join
    // sees a tiny fraction of the training side
    val e = evalDocs.selectExpr(fpE).distinct()
    val bloom = e.stat.bloomFilter("fp", math.max(1L, e.count()), 0.01)
    val trainN = train.count()
    val candidates = train.selectExpr(fpE)
      .collect().count(r => bloom.mightContainLong(r.getLong(0)))
    val trueMatches = trainN - want.size
    assert(candidates <= trueMatches + math.max(5L, (trainN * 0.05).toLong),
      s"bloom admitted $candidates of $trainN (true matches: $trueMatches)")
  }

  test("source cap keeps exactly the longest docs per source") {
    import graft.operators.Curation
    val kept = Curation.sourceCap(Tables.documents(spark, sf), cap = 15)
      .collect().groupBy(_.getString(1))
    kept.values.foreach(rs => assert(rs.length <= 15))
    // for each source, the kept set IS the top-15 by (n_chars desc, doc_id)
    val bySource = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
      .collect().groupBy(_.getString(1))
    bySource.foreach { case (src, rows) =>
      val expect = rows.sortBy(r => (-r.getLong(2), r.getLong(0))).take(15).map(_.getLong(0)).toSet
      assert(kept(src).map(_.getLong(0)).toSet == expect, s"source $src")
    }
  }

  test("rolling fingerprint and BPE-ish token count are deterministic and sane") {
    val fp1 = TextAnalysis.rollingFingerprint(docs).orderBy("doc_id").collect().toSeq
    val fp2 = TextAnalysis.rollingFingerprint(docs).orderBy("doc_id").collect().toSeq
    assert(fp1 == fp2)
    val bpe = TextAnalysis.tokenCountBpeIsh(docs)
      .join(docs.selectExpr("doc_id", s"size(${TextAnalysis.toksE}) AS n_ws"), "doc_id")
    // subword estimate is never below the whitespace count
    assert(bpe.where("n_tokens_bpeish < n_ws").count() == 0)
  }

  test("dup-line gates: planted line/paragraph duplicates hit exact Gopher fractions") {
    def toks(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      // doc 0: 24 unique tokens -> 2 unique lines, 1 para — clean
      (0L, toks("a", 24)),
      // doc 2 (4k+2 plant): 12 tokens -> 1 line + planted copy: both
      // line occurrences duplicated (10000), the single 2-line para is
      // unique (0)
      (2L, toks("b", 12)),
      // doc 7 (6k+1 plant): 36 tokens -> 3 lines + first-paragraph
      // re-append: 6 lines all duplicated, 2 identical paras
      (7L, toks("c", 36)),
      // doc 12 (no plant): first 12 tokens repeat as tokens 13-24 ->
      // lines L,L,M: 2 of 3 line occurrences duplicated
      (12L, toks("d", 12) + " " + toks("d", 12) + " " + toks("e", 12))
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length($"text"))
    val out = TextAnalysis.dupLines(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(3) == 0L && out(0L).getLong(5) == 0L && out(0L).getBoolean(7))
    assert(out(2L).getLong(1) == 2L && out(2L).getLong(3) == 10000L)
    assert(out(2L).getLong(5) == 0L && !out(2L).getBoolean(7))
    assert(out(7L).getLong(1) == 6L && out(7L).getLong(3) == 10000L)
    assert(out(7L).getLong(2) == 2L && out(7L).getLong(5) == 10000L)
    assert(out(12L).getLong(1) == 3L && out(12L).getLong(3) == 6666L)
    // char-mass twin: the three lines have identical length (d1..d12 and
    // e1..e12 render to the same widths), so dup chars = 2/3 of chars
    assert(out(12L).getLong(4) == 6666L)
  }

  test("native dup/ngram kernels count code points, not UTF-16 units, on non-BMP text") {
    import org.apache.spark.sql.graft.ColumnBridge
    // each emoji below is one code point but TWO UTF-16 code units —
    // a UTF-16 .length kernel would double-count every char mass here
    val emoji = "😀😁" // 😀😁: 2 code points, 4 units
    val rows = Seq((1L, Array(emoji, emoji, "ab", s"x$emoji")))
      .toDF("id", "arr")
    val dl = rows.withColumn("st", ColumnBridge.column(
        graft.plans.DupRunStats(ColumnBridge.expression($"arr"))))
      .selectExpr("st[0] AS n", "st[1] AS chars", "st[2] AS dupn", "st[3] AS dupc")
      .head()
    // Spark length() semantics: 2 + 2 + 2 + 3 = 9 chars; the emoji
    // value occurs twice -> dupn 2, dupc 4
    assert((dl.getLong(0), dl.getLong(1), dl.getLong(2), dl.getLong(3)) ==
      ((4L, 9L, 2L, 4L)))
    // and it matches Spark's own length() fold on the same array
    val sparkChars = rows.selectExpr(
      "aggregate(arr, 0L, (a, x) -> a + length(x)) AS c").head().getLong(0)
    assert(dl.getLong(1) == sparkChars)

    val ng = rows
      .selectExpr("id", s"concat(arr, arr) AS toks") // 8 tokens, every 2-gram duplicated-ish
      .withColumn("st", ColumnBridge.column(
        graft.plans.GopherNgramStats(ColumnBridge.expression($"toks"))))
      .selectExpr("st[0] AS n_chars", "st[1] AS top2").head()
    // n_chars = length(array_join(toks, ' ')) in code points
    val joined = rows.selectExpr(
      "cast(length(array_join(concat(arr, arr), ' ')) AS bigint) AS l")
      .head().getLong(0)
    assert(ng.getLong(0) == joined, s"kernel ${ng.getLong(0)} vs length() $joined")
    // 2-gram counts tie at 2; the (count, length) tie-break picks the
    // longest gram, (ab, x-emoji) = 6 code points -> mass 2 x 6
    assert(ng.getLong(1) == 12L)
  }

  test("passage dedup keeps a repeated passage only at its first occurrence and rebuilds docs in order") {
    // doc 1 and doc 5 share an identical 8-token passage at different
    // positions; doc 9 is doc 1 verbatim (every passage lost)
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val d1 = shared + " " + (1 to 8).map(i => s"one$i").mkString(" ")
    val d5 = (1 to 8).map(i => s"five$i").mkString(" ") + " " + shared + " tail1 tail2"
    val corpus = Seq((1L, d1), (5L, d5), (9L, d1)).toDF("doc_id", "text")
    val out = Dedup.passageDedup(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == ((2L, d1))) // first occurrence: intact, order preserved
    assert(out(5L) == ((2L, (1 to 8).map(i => s"five$i").mkString(" ") + " tail1 tail2")))
    assert(!out.contains(9L)) // exact copy: all passages deduped away
    // token conservation: kept tokens = distinct passages' tokens
    val total = out.values.map(_._2.split(" ").length).sum
    assert(total == 8 + 8 + 8 + 2, s"kept $total tokens")
  }

  test("minhash calibration: identical docs land in decile 10 with zero error; sketch sharp at the gate") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, words), (2L, words),
      (3L, (1 to 40).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Dedup.minhashCalibration(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the identical pair: est = exact = 1000, MAE 0
    assert(rows(10L) == ((1L, 1000L, 1000L, 0L)), s"got $rows")
    // on real data the curve must be sharp where the 0.5 gate reads it
    val real = Dedup.minhashCalibration(docs).where("decile >= 9")
      .agg(max("mae_e3")).head().getLong(0)
    assert(real <= 100, s"sketch MAE at the gate deciles too high: $real")
  }

  test("exact-substring dedup cuts misaligned repeats, keeps the first occurrence, merges overlaps") {
    import java.security.MessageDigest
    def md5(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 2 embeds doc 1's 10-token run at offset 3 — MISALIGNED with
    // any fixed 8-token grid (q139 cannot see it); the three
    // overlapping duplicate windows [1,9),[2,10),[3,11) in doc 2's run
    // must merge into ONE span; doc 1 (first occurrence) stays intact
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val d1 = run + " " + (1 to 6).map(i => s"a$i").mkString(" ")
    val d2 = "x1 x2 x3 " + run + " y1 y2"
    val out = Dedup.exactSubstringDedup(
        Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((16L, 0L, md5(d1))), "first occurrence intact")
    // doc 2: exactly the 10 run tokens cut, prefix+suffix survive
    assert(out(2L) == ((15L, 10L, md5("x1 x2 x3 y1 y2"))))
    // a doc that is one long self-repeat: 'z…z' 24 tokens = 3 copies of
    // an 8-token unit; every window after the first is a duplicate of
    // an earlier one ⇒ one merged span [9,25) — the first unit survives
    val unit = (1 to 8).map(i => s"z$i").mkString(" ")
    val d3 = Seq(unit, unit, unit).mkString(" ")
    val solo = Dedup.exactSubstringDedup(
        Seq((7L, d3)).toDF("doc_id", "text")).head()
    assert(solo.getLong(1) == 24L && solo.getLong(2) == 16L &&
      solo.getString(3) == md5(unit))
  }

  /** The packed-key domain guards (q139/q152): a document past the
    * per-doc index budget must kill the job with the operator's
    * raise_error message — never silently fold its passages/windows
    * into the next doc_id's key space and corrupt keep-first winners. */
  test("passage dedup fails loudly on a document past the 524k-token packed budget") {
    // 65537 passages at w=8 ⇒ pidx reaches 65536, one past the 2^16 cap
    val oversized = Seq.tabulate(65537 * 8)(i => s"t$i").mkString(" ")
    val corpus = Seq((1L, oversized), (2L, "ok tokens here")).toDF("doc_id", "text")
    val e = intercept[Throwable] { Dedup.passageDedup(corpus).collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(m => m.contains("passageDedup") && m.contains("packed-key")),
      s"expected the passageDedup packed-key raise, got: ${msgs.take(3)}")
    // one token under the cap still runs clean
    val atCap = Seq.tabulate(65536 * 8)(i => s"t$i").mkString(" ")
    assert(Dedup.passageDedup(Seq((1L, atCap)).toDF("doc_id", "text"))
      .head().getLong(1) == 65536L)
  }

  test("exact-substring dedup fails loudly on a document past the 2^20 window budget") {
    // windows start at i = 1..(n-7); n = 2^20 + 8 drives i to 2^20 + 1
    val oversized = Seq.tabulate(1048576 + 8)(i => s"t$i").mkString(" ")
    val e = intercept[Throwable] {
      Dedup.exactSubstringDedup(Seq((1L, oversized)).toDF("doc_id", "text")).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(m => m.contains("exactSubstringDedup") && m.contains("packed-key")),
      s"expected the exactSubstringDedup packed-key raise, got: ${msgs.take(3)}")
  }

  test("epoch shuffle is a per-epoch permutation with epoch-dependent order") {
    import graft.operators.Packing
    val n = docs.count()
    val shuf = Packing.epochShuffle(docs, epochs = 2).cache()
    // every epoch contains the corpus exactly once
    assert(shuf.groupBy("epoch").count().collect().forall(_.getLong(1) == n))
    assert(shuf.groupBy("epoch", "doc_id").count().where("count > 1").count() == 0)
    // positions are contiguous 1..k within each (epoch, shard)
    val bad = shuf.groupBy("epoch", "shard")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("c"))
      .where("mn != 1 OR mx != c").count()
    assert(bad == 0)
    // the two epochs order the corpus differently (hash keyed on epoch)
    val e0 = shuf.where("epoch = 0").orderBy("shard", "pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    val e1 = shuf.where("epoch = 1").orderBy("shard", "pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(e0 != e1, "epochs must reshuffle")
    shuf.unpersist()
  }

  test("BPE merges greedily left-to-right and learns cascaded subwords") {
    import graft.operators.Bpe
    // 'aaaa'×10: pair (a,a) counts 3 per word (overlaps counted, the
    // subword-nmt convention) = 30; 'bc'×20 counts 20. First merge must
    // be (a,a) and the greedy-left pass leaves [aa, aa] — so step 2's
    // top pair is (aa, aa) with count 10 if 'aaaa' still dominates...
    // make it not: bc outnumbers at 20 ⇒ step 2 = (b, c).
    val corpus = Seq(
      (1L, Array.fill(10)("aaaa").mkString(" ")),
      (2L, Array.fill(20)("bc").mkString(" "))
    ).toDF("doc_id", "text")
    val m = Bpe.bpeMerges(corpus, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1L, "a", "a", 30L)))   // 3 overlapping pairs/type × 10
    assert(m(1) == ((2L, "b", "c", 20L)))
    // after merging, 'aaaa' = [aa, aa]: one (aa, aa) pair × 10
    assert(m(2) == ((3L, "aa", "aa", 10L)))
  }

  test("batched BPE equals sequential on a planted vocab of disjoint well-separated pairs") {
    import graft.operators.Bpe
    // three pairwise-disjoint pairs with strictly separated counts:
    // sequential learns (a,b), (c,d), (e,f) in 3 argmax rounds; one
    // batch of 3 must pick and apply exactly the same merges, because
    // disjoint pairs' counts are invariant under each other's merges
    // and no cross-pair adjacency can outrank them here
    val corpus = Seq(
      (1L, Array.fill(30)("ab").mkString(" ")),
      (2L, Array.fill(20)("cd").mkString(" ")),
      (3L, Array.fill(10)("ef").mkString(" "))).toDF("doc_id", "text")
    val (symsSeq, mSeq, _) = Bpe.trainSymsBatched(corpus, 3, 1)
    val (symsBat, mBat, rounds) = Bpe.trainSymsBatched(corpus, 3, 3)
    assert(mBat == mSeq, s"batched $mBat vs sequential $mSeq")
    assert(rounds == 1)
    assert(symsBat.orderBy("w", "pos").collect().toSeq ==
      symsSeq.orderBy("w", "pos").collect().toSeq)
    // conflict pruning: (a,b) count 30 and (b,c) count 20 share 'b' —
    // one fixed-M batch must take (a,b), DEFER (b,c), and take
    // disjoint (d,e)
    val conflict = Seq(
      (1L, Array.fill(30)("ab").mkString(" ")),
      (2L, Array.fill(20)("bc").mkString(" ")),
      (3L, Array.fill(10)("de").mkString(" "))).toDF("doc_id", "text")
    val (_, mc, _) = Bpe.trainSymsBatched(conflict, 2, 2)
    assert(mc.map(m => (m._2, m._3)) == Seq(("a", "b"), ("d", "e")), s"got $mc")
  }

  test("frequency-gap batching equals sequential where fixed-M diverges") {
    import graft.operators.Bpe
    // the overtake corpus: merging (a,b) births (x,ab) at count 10,
    // which sequential merges BEFORE (c,d):9 — fixed-M batching takes
    // (c,d) and (e,f) in round 1 and learns a different vocabulary;
    // gap batching cuts at the (x,a) conflict, shrinks to {(a,b)},
    // and reproduces the sequential list exactly in fewer rounds
    val corpus = Seq(
      (1L, Array.fill(10)("xab").mkString(" ")),
      (2L, Array.fill(9)("cd").mkString(" ")),
      (3L, Array.fill(8)("ef").mkString(" "))).toDF("doc_id", "text")
    val (_, mSeq, rSeq) = Bpe.trainSymsBatched(corpus, 3, 1)
    assert(mSeq.map(m => (m._2, m._3)) == Seq(("a", "b"), ("x", "ab"), ("c", "d")),
      s"sequential learned $mSeq")
    val (_, mFix, _) = Bpe.trainSymsBatched(corpus, 3, 3)
    assert(mFix.map(m => (m._2, m._3)) != mSeq.map(m => (m._2, m._3)),
      s"fixed-M should diverge here, got $mFix")
    val (symsGap, mGap, rGap) = Bpe.trainSymsBatched(corpus, 3, 3, gapExact = true)
    assert(mGap == mSeq, s"gap $mGap vs sequential $mSeq")
    assert(rGap == 2 && rSeq == 3, s"gap rounds $rGap, sequential $rSeq")
    // and the production trainSyms IS the gap mode: same table
    val (symsProd, mProd) = Bpe.trainSyms(corpus, 3)
    assert(mProd == mSeq)
    assert(symsProd.orderBy("w", "pos").collect().toSeq ==
      symsGap.orderBy("w", "pos").collect().toSeq)
  }

  test("BPE training stops cleanly when the pair vocabulary runs out") {
    import graft.operators.Bpe
    // 'ab'×5: one merge exhausts every adjacent pair; asking for 5
    // must return the 1 learnable merge, not throw on an empty argmax
    val tiny = Seq((1L, Array.fill(5)("ab").mkString(" "))).toDF("doc_id", "text")
    val m = Bpe.bpeMerges(tiny, k = 5).collect()
    assert(m.length == 1 && m(0).getString(1) == "a" && m(0).getString(2) == "b")
    // single-character words: zero learnable merges, zero rows
    val chars = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(Bpe.bpeMerges(chars, k = 3).count() == 0)
  }

  test("BPE tokenize applies the learned segmentation per word type") {
    import graft.operators.Bpe
    // after (a,a), (b,c), (aa,aa): 'aaaa' → [aaaa], 'bc' → [bc]
    val corpus = Seq(
      (1L, Array.fill(10)("aaaa").mkString(" ")),
      (2L, Array.fill(20)("bc").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Bpe.bpeTokenCounts(corpus, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((10L, 10L)))
    assert(out(2L) == ((20L, 20L)))
    // on the real corpus: words ≤ bpe tokens ≤ chars, always
    val sane = Bpe.bpeTokenCounts(docs, k = 2)
      .join(docs.selectExpr("doc_id", s"size(${TextAnalysis.toksE}) AS nw",
        "length(replace(text, ' ', '')) AS nc"), "doc_id")
      .where("n_bpe_tokens < n_words OR n_bpe_tokens > nc").count()
    assert(sane == 0)
  }

  test("budget mixture keeps the exact best-first prefix within 800 tokens per source") {
    import graft.operators.Curation
    val kept = Curation.budgetSample(docs).collect()
    val bySource = kept.groupBy(_.getString(1))
    // budget respected, cum_tokens is the running sum in score order
    bySource.foreach { case (src, rows) =>
      val sorted = rows.sortBy(r => (-r.getLong(3), r.getLong(0)))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(2)
        assert(r.getLong(4) == cum, s"cum mismatch in $src")
      }
      assert(cum <= 800L, s"budget exceeded in $src")
    }
    // prefix property: every scored doc NOT kept either overflows the
    // budget at its position or scores below the kept set's minimum
    val scored = TextAnalysis.hashedClassifier(docs)
      .join(docs.select("doc_id", "source"), "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(4), r.getLong(1), r.getLong(2)))
    scored.groupBy(_._2).foreach { case (src, rows) =>
      val keptIds = bySource.get(src).map(_.map(_.getLong(0)).toSet).getOrElse(Set.empty)
      val order = rows.sortBy(t => (-t._4, t._1))
      var cum = 0L
      order.foreach { case (id, _, n, _) =>
        cum += n
        assert(keptIds.contains(id) == (cum <= 800L), s"doc $id in $src")
      }
    }
  }

  test("semantic decontam drops a planted exact copy of an eval vector, keeps orthogonal train vecs") {
    // eval ids are vec_id % 13 = 5 → {5, 18}; train vec 20 is an EXACT
    // copy of eval vec 18 (cosine 1 ≥ τ), every other pair orthogonal
    val dim = 64
    def basis(i: Int): Seq[Float] =
      Seq.tabulate(dim)(d => if (d == i) 1.0f else 0.0f)
    val rows = Seq(
      5L -> basis(9), 18L -> basis(0), // eval
      1L -> basis(1), 2L -> basis(2), 3L -> basis(3), 4L -> basis(4),
      6L -> basis(5), 7L -> basis(6), 20L -> basis(0)) // 20 = copy of 18
    val emb = rows.toDF("vec_id", "embedding")
    val (cents, asg) = Similarity.ivfIndex(emb, k = 4, trainMod = 1)
    val out = Similarity.semanticDecontam(emb, cents, asg)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 6L, 7L, 20L),
      "output is exactly the train side")
    val byId = out.map(r => r._1 -> r).toMap
    assert(!byId(20L)._4 && byId(20L)._3 >= 1L, "planted leak must be dropped")
    Seq(1L, 2L, 3L, 4L, 6L, 7L).foreach { id =>
      assert(byId(id)._4 && byId(id)._3 == 0L, s"orthogonal train vec $id kept")
    }
  }

  test("proto prune cuts exactly the most-prototypical 25% per cluster (ties to smaller id)") {
    val emb = Tables.embeddings(spark, sf)
    val (cents, _) = Similarity.ivfIndexFor(spark, sf)
    val rows = Similarity.protoPrune(emb, cents)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length == emb.count())
    rows.groupBy(_._2).foreach { case (cid, cl) =>
      val n = cl.length.toLong
      val nKeep = n - (25L * n) / 100L
      assert(cl.count(_._5) == nKeep, s"cluster $cid keep count")
      // kept = the n_keep least-prototypical in (sim asc, id asc) order
      val expectKept = cl.sortBy(r => (r._3, r._1)).take(nKeep.toInt)
        .map(_._1).toSet
      assert(cl.filter(_._5).map(_._1).toSet == expectKept, s"cluster $cid cut")
    }
  }

  test("hashed classifier score is the sum of its per-token weights") {
    val out = TextAnalysis.hashedClassifier(Seq((7L, "alpha beta alpha")).toDF("doc_id", "text"))
      .collect().head
    val w = (t: String) => spark.sql(
      s"SELECT ${graft.functions.Portable.sparkHash48(s"'qw1_$t'")} % 2001 - 1000")
      .collect().head.getLong(0)
    assert(out.getLong(1) == 3L)
    assert(out.getLong(2) == 2 * w("alpha") + w("beta"))
    assert(out.getBoolean(3) == (out.getLong(2) > 0))
  }

  test("simhash wide-regime banding (C(6,3) block combos) emits exactly the narrow-regime pairs") {
    // force the wide plan on the small corpus: recall is GUARANTEED in
    // both regimes, so the pair sets must be identical row-for-row
    val narrow = Dedup.simhashPairs(docs).as[(Long, Long, Long)].collect().toSet
    val wide = Dedup.simhashPairs(docs, wideThreshold = 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(narrow.nonEmpty, "corpus should contain simhash near-dup pairs")
    assert(wide == narrow,
      s"only-narrow=${narrow -- wide}, only-wide=${wide -- narrow}")
  }

  test("simhash wide-regime pigeonhole: every 3-dirty-block pattern leaves a clean chosen combo") {
    val combos = (0 to 5).combinations(3).map(_.toSet).toSeq
    for (dirty <- (0 to 5).combinations(3).map(_.toSet) ++
                  (0 to 5).combinations(2).map(_.toSet) ++
                  (0 to 5).combinations(1).map(_.toSet)) {
      assert(combos.exists(c => c.intersect(dirty).isEmpty),
        s"dirty blocks $dirty dodge every chosen combo")
    }
  }

  test("matryoshka funnel recall ladder is monotone with measured floors (untrained-embedding case)") {
    val exact = Similarity.cosineTopK(Tables.embeddings(spark, sf))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(prefix: Int): Double = {
      val got = Similarity.matryoshkaTopK(Tables.embeddings(spark, sf),
          prefixDims = prefix, shortlist = 50)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val ladder = Seq(16, 32, 48).map(recall)
    assert(ladder == ladder.sorted, s"recall not monotone in prefix width: $ladder")
    assert(ladder(1) >= 0.6, s"prefix-32 recall ${ladder(1)} below floor 0.6")
    assert(ladder(2) >= 0.9, s"prefix-48 recall ${ladder(2)} below floor 0.9")
  }

  test("v5 verdict flip: a doc the whole-doc decontam drops survives the scrub with flanks intact and re-gates clean") {
    import graft.operators.{Curation, CurationPipeline}
    // eval doc (id % 97 = 3) donates 8 consecutive tokens; the train doc
    // re-houses them between 6-token clean flanks — contaminated for the
    // q62 whole-doc rule, surgically recoverable for the q216 scrub
    val evalText = (1 to 20).map(i => s"ev$i").mkString(" ")
    val front = (1 to 6).map(i => s"fl$i").mkString(" ")
    val back = (1 to 6).map(i => s"bk$i").mkString(" ")
    val leaked = (5 to 12).map(i => s"ev$i").mkString(" ")
    val cleanTxt = (1 to 15).map(i => s"cl$i").mkString(" ")
    val corpus = Seq(3L -> evalText, 10L -> s"$front $leaked $back",
      11L -> cleanTxt).toDF("doc_id", "text")
    // the v3/v4 route DROPS doc 10 whole
    val flags = Curation.decontaminate(corpus).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(10L) && !flags(11L))
    // the v5 route cuts EXACTLY the copied interior
    val evalSh = Curation.evalShingleSet(corpus.where("doc_id % 97 = 3"))
    val scrubbed = Curation.decontamScrubText(
        corpus.where("doc_id % 97 != 3"), evalSh)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrubbed(10L) == s"$front $back",
      s"scrub must keep exactly the flanks: '${scrubbed(10L)}'")
    assert(scrubbed(11L) == cleanTxt)
    // and the re-gate KEEPS the scrubbed doc — the verdict flip whose
    // recovered token mass the q224 funnel's scrub row reports
    val regated = CurationPipeline.qualityGate(
      Seq(10L -> scrubbed(10L)).toDF("doc_id", "text"))
    assert(regated.count() == 1)
  }

  test("decile agreement: kappa peaks at the planted cut, is 0 for a constant keeper, and n=0 rows are pinned") {
    import graft.operators.Curation
    // 1000 docs, score descending in doc_id: decile d = ids (d-1)*100+1
    // .. d*100. Keeper = "decile <= 5" with a deterministic 10% flip —
    // run through the REAL operator, κ must peak at cut 5
    val scores = (1L to 1000L).map(i => (i, 2000L - i)).toDF("doc_id", "lm_score_e6")
    val keepCorr = (1L to 1000L).map { i =>
      val headHalf = i <= 500
      (i, if (i % 10 == 0) !headHalf else headHalf)
    }.toDF("doc_id", "f_clf")
    val out = Curation.decileAgreementFrom(scores, keepCorr).collect()
      .map(r => r.getLong(0) -> r.getLong(7)).toMap
    assert(out(5L) > 7000, s"kappa at the planted cut should be ~0.8: $out")
    assert(out(5L) > out(1L) && out(5L) > out(9L),
      s"kappa must peak at the planted cut: $out")
    // a constant keeper carries no signal: κ = 0 at every cut
    val keepAll = (1L to 1000L).map(i => (i, true)).toDF("doc_id", "f_clf")
    val flat = Curation.decileAgreementFrom(scores, keepAll).collect()
      .map(r => r.getLong(7))
    assert(flat.forall(_ == 0L), s"constant keeper must score 0 kappa: ${flat.toSeq}")
    // empty common support: the guarded degenerate row, not a null/error
    val none = Curation.decileAgreementFrom(scores,
      Seq.empty[(Long, Boolean)].toDF("doc_id", "f_clf")).collect()
    assert(none.forall(r => r.getLong(6) == 10000L && r.getLong(7) == 10000L))
  }
}
