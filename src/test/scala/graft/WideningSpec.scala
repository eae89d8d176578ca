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
