package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank unit shapes beyond the q111 oracle gate: closed-form
  * fixpoints, rank ordering on a hub topology, integer mass accounting,
  * and partitioning-invariance (the determinism claim the scaled-integer
  * arithmetic exists to deliver). */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val R = 1000000000000L

  test("2-cycle is a fixpoint: both nodes hold exactly R/2 after any number of rounds") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // r0 = R/2; contribution = R/2 (outdeg 1); r' = 15R/200 + 85(R/2)/100
    //    = 75e9 + 425e9 = 500e9 = R/2 — exact, no flooring loss
    assert(out.toSeq == Seq((1L, R / 2), (2L, R / 2)))
  }

  test("hub with all leaves pointing in out-ranks every leaf") {
    val leaves = (1L to 6L)
    val edges = (leaves.map(l => (l, 0L)) ++ leaves.map(l => (0L, l))).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(0L)
    leaves.foreach(l => assert(hub > ranks(l), s"hub $hub should out-rank leaf ${ranks(l)}"))
  }

  test("total rank mass stays within flooring loss of R (conservation bound)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 3).collect().map(_.getLong(1))
    val total = ranks.sum
    // every node floors at most once per term per round; with 5 nodes, 3
    // rounds and damping the loss bound is tiny relative to R. Node 4 has
    // no in-edges (teleport-only) but its OUT-contribution is counted, so
    // mass is conserved up to integer floors.
    assert(total <= R, s"mass created: $total > $R")
    assert(total >= R - 1000L, s"mass lost beyond flooring bound: $total")
  }

  test("checkpointing bounds the 12-round plan and leaves ranks bit-identical") {
    val edges = spark.range(400).selectExpr("id % 19 AS src", "(id * 11) % 23 AS dst")
      .where("src != dst")
    val checked = Graph.pageRank(edges, iters = 12, checkpointEvery = 3)
    val free = Graph.pageRank(edges, iters = 12, checkpointEvery = 1000)
    val planLines = (df: org.apache.spark.sql.DataFrame) =>
      df.queryExecution.optimizedPlan.treeString.linesIterator.size
    val (pc, pf) = (planLines(checked), planLines(free))
    // last checkpoint fires at round 9 → the residual plan is ~3 rounds
    // deep regardless of total iterations; unchecked grows with all 12
    assert(pc * 2 < pf, s"checkpointed plan $pc lines vs free-running $pf")
    val a = checked.orderBy("node").collect().toSeq
    val b = free.orderBy("node").collect().toSeq
    assert(a == b, "localCheckpoint changed the integer ranks")
  }

  test("dangling-mass redistribution conserves total rank within flooring loss") {
    // node 3 is dangling (no out-edges): without redistribution its
    // damped mass leaks every round; with it, totals stay pinned to R
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L), (2L, 1L)).toDF("src", "dst")
    def total(redistribute: Boolean) =
      Graph.pageRank(edges, iters = 6, redistributeDangling = redistribute)
        .collect().map(_.getLong(1)).sum
    val kept = total(redistribute = true)
    val leaked = total(redistribute = false)
    assert(kept <= R && kept >= R - 1000L,
      s"redistributed mass $kept escaped the flooring bound around $R")
    assert(leaked < kept - R / 100L,
      s"leak $leaked not visibly below conserved $kept — dangling plant broken?")
    // determinism holds on the redistribution path too
    val a = Graph.pageRank(edges, iters = 6, redistributeDangling = true)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(edges.repartition(7), iters = 6, redistributeDangling = true)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("ranks are invariant to input partitioning (integer arithmetic has no sum-order sensitivity)") {
    val edges = spark.range(300).selectExpr("id % 17 AS src", "(id * 7) % 13 AS dst")
      .where("src != dst")
    val a = Graph.pageRank(edges, iters = 3).orderBy("node").collect().toSeq
    val b = Graph.pageRank(edges.repartition(11), iters = 3).orderBy("node").collect().toSeq
    assert(a == b)
  }
}
