package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-16 widening queries — properties
  * the DuckDB hash gate proves only implicitly: D4's composition
  * actually differs from its stages, the dedup-locality inequality,
  * the keep-longest contract, RRF's contribution bounds, and the
  * epoch-decay monotonicity. */
class WideningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("q190 D4 ranks only q159 survivors, and cuts 25% per cluster of THEM") {
    val sem = SparkEntry.queries("q159_semantic_dedup")(spark, sf)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    val d4 = SparkEntry.queries("q190_d4_prune")(spark, sf)
      .select("vec_id", "cid", "kept").as[(Long, Long, Boolean)].collect()
    assert(d4.nonEmpty && d4.forall { case (v, _, _) => sem(v) })
    // per cluster: kept = n - 25%·n of the SURVIVOR count (not the raw one)
    d4.groupBy(_._2).foreach { case (_, rows) =>
      val n = rows.length.toLong
      assert(rows.count(_._3) == n - (25 * n) / 100)
    }
    // the composition genuinely differs from standalone q170 somewhere:
    // at least one vector flips its kept verdict once near-dups vacate ranks
    val solo = SparkEntry.queries("q170_proto_prune")(spark, sf)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(d4.exists { case (v, _, k) => solo(v) != k })
  }

  test("q192 locality: local drops never exceed global drops, planted gap shows") {
    val r = SparkEntry.queries("q192_dedup_locality")(spark, sf)
      .select("n_drop_global", "n_drop_local", "n_missed_local")
      .as[(Long, Long, Long)].collect()
    assert(r.forall { case (g, l, m) => l <= g && m == g - l })
    assert(r.map(_._3).sum > 0, "cross-source plants must be missed by local dedup")
    assert(r.map(_._2).sum > 0, "same-source plants must be caught locally")
  }

  test("q193 keeps exactly one member per cluster, and it is the longest") {
    val r = SparkEntry.queries("q193_keep_longest")(spark, sf)
      .select("cluster", "n_chars", "kept").as[(Long, Long, Boolean)].collect()
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.count(_._3) == 1)
      assert(rows.filter(_._3).head._2 == rows.map(_._2).max)
    }
  }

  test("q196 RRF scores are sums of the two legs' floor-div contributions") {
    val r = SparkEntry.queries("q196_hybrid_rrf")(spark, sf)
      .select("rrf_e6", "r_lex", "r_sem").as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (s, rl, rs) =>
      val want = (if (rl > 0) 1000000L / (60 + rl) else 0L) +
        (if (rs > 0) 1000000L / (60 + rs) else 0L)
      assert(s == want)
    }
    // a doc present in BOTH legs must outrank one present at the same
    // single-leg rank only — the fusion property; vacuous if legs are
    // disjoint, so just pin that every rank is distinct and 1-based
    assert(SparkEntry.queries("q196_hybrid_rrf")(spark, sf)
      .select("rank").as[Long].collect().sorted.zipWithIndex
      .forall { case (rk, i) => rk == i + 1 })
  }

  test("binary sign encode: strict positivity, zero maps to 0, words reconstruct") {
    import graft.operators.ProductQuant
    // dims 0 and 33 positive, dim 1 exactly zero (not a set bit), rest negative
    val emb = spark.range(1).selectExpr("id AS vec_id",
      "transform(sequence(0, 63), d -> cast(CASE WHEN d = 0 OR d = 33 THEN 0.5 WHEN d = 1 THEN 0.0 ELSE -0.5 END AS float)) AS embedding")
    val r = ProductQuant.binaryEncode(emb).head()
    assert(r.getLong(1) == 1L)      // lo: only bit 0
    assert(r.getLong(2) == 2L)      // hi: only bit 33-32 = 1
  }

  test("q201's hamming agrees with the float-side sign disagreement count") {
    import graft.operators.ProductQuant
    val e = Tables.embeddings(spark, sf)
    val enc = ProductQuant.binaryEncode(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val signs = e.selectExpr("vec_id",
      "transform(embedding, x -> cast(x AS double) > 0D) AS s").collect()
      .map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    val ids = enc.keySet.take(10).toSeq
    for (a <- ids; b <- ids if a < b) {
      val want = signs(a).zip(signs(b)).count { case (x, y) => x != y }
      val got = java.lang.Long.bitCount(enc(a)._1 ^ enc(b)._1) +
        java.lang.Long.bitCount(enc(a)._2 ^ enc(b)._2)
      assert(got == want, s"pair ($a,$b)")
    }
  }

  test("q197 decay: repetition is never worth face value, uniques always are") {
    val r = SparkEntry.queries("q197_data_constrained")(spark, sf)
      .select("u_tokens", "alloc_tokens", "rep_e4", "eff_tokens", "waste_e4")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (u, alloc, rep, eff, waste) =>
      if (alloc <= u) assert(eff == alloc && rep == 0)
      else {
        assert(eff >= u, "unique mass is always fully valued")
        assert(eff < alloc, "repeated tokens are strictly discounted")
        assert(waste > 0)
      }
      // asymptote: effective value never exceeds U·(1 + R*)
      assert(eff <= u + (u * 154) / 10)
    }
    assert(r.exists(_._3 > 0), "the 4x budget must force repetition somewhere")
  }
}
