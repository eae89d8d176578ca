package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph computation — PageRank as the representative: the
  * loop-of-joins execution shape (Pregel/GraphX's core) that none of the
  * other operators exercise. Curation uses it for domain-graph trust
  * propagation (rank hosts by who links to them, keep high-rank
  * sources); the same loop is label propagation / connected components
  * with a different merge function (see Dedup.clusterLabels).
  *
  * Determinism across engines: rank arithmetic is SCALED-INTEGER (e12)
  * with integral division only — `r/outdeg` and the damping multiply
  * both floor in BIGINT on both engines, so after any number of
  * iterations the ranks are bit-identical to the DuckDB twin (no float
  * summation-order sensitivity; integer SUM is associative). A float
  * formulation would need end rounding and still be one ulp away from
  * portable under reordered partial sums.
  *
  * Scale posture per iteration: ranks ⋈ outdeg (co-keyed), edges ⋈
  * ranks shuffled on src, partial-aggregated SUM shuffled on dst, left
  * join back to the node set — three key-partitioned shuffles of
  * edge/node cardinality, never a cross product. Edges are cached (each
  * iteration re-reads them); at real iteration counts, localCheckpoint
  * every few rounds bounds lineage exactly as Dedup's label-prop loop
  * does. Dangling-node mass is dropped (the standard simplification;
  * redistribution adds one scalar agg per round if needed).
  */
object Graph {

  private val R = 1000000000000L // e12 rank scale

  /** `iters` rounds of damped PageRank (d=0.85) over distinct directed
    * `(src, dst)` edges; returns (node, rank_e12). Self-loops must be
    * pre-filtered by the caller.
    *
    * `checkpointEvery`: every k-th iteration the rank frame is
    * `localCheckpoint`ed, truncating the logical plan — without it the
    * loop-of-joins lineage grows linearly and Catalyst re-optimizes an
    * ever-larger tree every round (the exponential-plan lesson Dedup's
    * label-prop loop learned in round 3). The default (5) never fires
    * at q111's 3 gated iterations, so the oracle plan is untouched;
    * GraphSpec runs 12 rounds and asserts the truncation both bounds
    * the plan and leaves the integer ranks bit-identical.
    *
    * `redistributeDangling`: PageRank's standard correction — a node
    * with no out-edges drops its mass on the floor; redistribution
    * hands each round's dangling mass back to every node (`dang div n`
    * per node, integral, so cross-engine determinism is preserved).
    * Costs ONE scalar aggregate per round (anti-join of the rank frame
    * against the out-degree frame, summed to a 1-row broadcast). Off by
    * default: q111's graph and oracle use the drop-the-mass
    * simplification; GraphSpec pins conservation with it on. */
  def pageRank(edges0: DataFrame, iters: Int, checkpointEvery: Int = 5,
      redistributeDangling: Boolean = false): DataFrame = {
    require(checkpointEvery > 0, "pageRank: checkpointEvery must be positive")
    val edges = edges0.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().cache()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().cache()
    val nn = nodes.agg(count(lit(1)).cast("long").as("n"))
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("outdeg"))
      .cache()
    var ranks = nodes.join(broadcast(nn)).selectExpr("node", s"${R}L div n AS r")
    for (i <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .selectExpr("dst", "r div outdeg AS c")
        .groupBy("dst").agg(sum("c").cast("long").as("m"))
      val base = nodes.join(broadcast(nn))
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
      ranks =
        if (!redistributeDangling) {
          base.selectExpr("node",
            s"(15 * ${R}L) div (100 * n) + (85 * coalesce(m, 0L)) div 100 AS r")
        } else {
          val dang = ranks.join(deg, ranks("node") === deg("src"), "left_anti")
            .agg(coalesce(sum("r"), lit(0L)).cast("long").as("dang"))
          base.join(broadcast(dang)).selectExpr("node",
            s"(15 * ${R}L) div (100 * n) + " +
              "(85 * (coalesce(m, 0L) + dang div n)) div 100 AS r")
        }
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.selectExpr("node", "r AS rank_e12")
  }

  /** q111: 3 PageRank rounds on the part→supplier co-occurrence graph
    * folded to 64 nodes a side (`l_partkey%64 → l_suppkey%64`), the
    * deterministic dense-ish test graph every SF produces. DuckDB twin
    * unrolls the identical integer recurrence as chained CTEs. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_pagerank" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .selectExpr("l_partkey % 64 AS src", "l_suppkey % 64 AS dst")
        .where("src <> dst")
      pageRank(edges, iters = 3).orderBy("node")
    }))

  def oracle: Map[String, String] = Map(
    "q111_pagerank" ->
      s"""WITH edges AS (
         |  SELECT DISTINCT l_partkey % 64 AS src, l_suppkey % 64 AS dst
         |  FROM lineitem WHERE l_partkey % 64 <> l_suppkey % 64),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
         |r0 AS (SELECT node, $R // n AS r FROM nodes CROSS JOIN nn),
         |m1 AS (SELECT e.dst AS node, SUM(r0.r // deg.outdeg) AS m
         |       FROM edges e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
         |       GROUP BY e.dst),
         |r1 AS (SELECT nodes.node, (15 * $R) // (100 * n) + (85 * COALESCE(m1.m, 0)) // 100 AS r
         |       FROM nodes CROSS JOIN nn LEFT JOIN m1 ON nodes.node = m1.node),
         |m2 AS (SELECT e.dst AS node, SUM(r1.r // deg.outdeg) AS m
         |       FROM edges e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
         |       GROUP BY e.dst),
         |r2 AS (SELECT nodes.node, (15 * $R) // (100 * n) + (85 * COALESCE(m2.m, 0)) // 100 AS r
         |       FROM nodes CROSS JOIN nn LEFT JOIN m2 ON nodes.node = m2.node),
         |m3 AS (SELECT e.dst AS node, SUM(r2.r // deg.outdeg) AS m
         |       FROM edges e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
         |       GROUP BY e.dst),
         |r3 AS (SELECT nodes.node, (15 * $R) // (100 * n) + (85 * COALESCE(m3.m, 0)) // 100 AS r
         |       FROM nodes CROSS JOIN nn LEFT JOIN m3 ON nodes.node = m3.node)
         |SELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r3 ORDER BY node""".stripMargin)
}
