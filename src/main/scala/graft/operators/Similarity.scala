package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, dim 64).
  *
  * - Brute-force cosine top-k: the exactness baseline. Queries are a
  *   small set broadcast against the corpus; per-query top-k via window.
  *   At 100 TB this is the per-query-batch scan pattern (corpus scan ×
  *   broadcast queries — no shuffle of the corpus itself).
  * - Random-hyperplane LSH bucketing: the scale path. Sign-bit bucket ids
  *   computed from fixed ±1 planes over *integer-quantized* components
  *   (`round(x*1000)`), making the bucket assignment integer-exact and
  *   therefore DuckDB-oracle-checkable — no FP-order hazards. Candidate
  *   generation is then an equi-join on bucket id.
  *
  * All expression-only (zip_with/aggregate fold left-to-right
  * deterministically); cosine outputs are rounded to 6 dp before ranking
  * so both engines rank identical values.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns, as an
    * expression folding in index order. */
  private def cosineE(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0D, (acc, v) -> acc + v)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Brute-force cosine top-k neighbors for each query vector. */
  def cosineTopK(embeddings: DataFrame, queryMaxId: Long = 10, k: Int = 5): DataFrame = {
    val vecs = embeddings.selectExpr("vec_id", "cast(embedding as array<double>) AS v")
    val queries = vecs.where(s"vec_id < $queryMaxId").toDF("query_id", "q")
    val scored = vecs.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id", s"round(${cosineE("q", "v")}, 6) AS sim")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  /** Integer-quantized embedding: round(x*1000) per component — exact in
    * both engines, basis for the LSH dot products. */
  private val quantE = "transform(cast(embedding as array<double>), x -> cast(round(x * 1000) as bigint))"

  /** Sign-bit LSH bucket id from the fixed ±1 hyperplanes. */
  def lshBuckets(embeddings: DataFrame): DataFrame = {
    val dots = (0 until LshPlanes).map { j =>
      s"aggregate(zip_with(q, array(${planeElems(j)}), (x, s) -> x * s), 0L, (acc, v) -> acc + v)"
    }
    val bucketE = dots.zipWithIndex
      .map { case (d, j) => s"if($d >= 0, ${1L << j}L, 0L)" }
      .mkString(" + ")
    embeddings.selectExpr("vec_id", s"$quantE AS q")
      .selectExpr("vec_id", s"cast($bucketE as bigint) AS bucket")
  }

  /** LSH-bucketed near-neighbor candidates: pairs sharing a bucket, with
    * exact cosine attached — the ANN candidate join at scale (equi-join
    * on bucket, never a cross product). */
  def lshCandidates(embeddings: DataFrame): DataFrame = {
    val vecs = embeddings.selectExpr("vec_id", "cast(embedding as array<double>) AS v")
    val buckets = lshBuckets(embeddings)
    val withV = buckets.join(vecs, "vec_id")
    val a = withV.toDF("vec_a", "bucket", "va")
    val b = withV.toDF("vec_b", "bucket", "vb")
    a.join(b, "bucket")
      .where(col("vec_a") < col("vec_b"))
      .selectExpr("vec_a", "vec_b", "bucket", s"round(${cosineE("va", "vb")}, 6) AS sim")
  }

  // ---------------------------------------------------------------- IVF

  /** IVF coarse index: k centroids (deterministic evenly-spaced seeds +
    * `iters` Lloyd refinements) and the inverted assignment lists.
    * Returns (centroids(cid, c), assignments(vec_id, cid)).
    *
    * The scale path complement to LSH bucketing: train once (tiny
    * centroid table), broadcast centroids, assign with a narrow map, and
    * search touches only `nprobe` of the k lists. Spark-only (Lloyd's
    * FP averaging isn't cross-engine-exact); exactness is anchored by
    * the spec's nprobe=k ≡ brute-force identity. Caches the vector frame
    * for the training iterations; caller-managed eviction (as with
    * Dedup.minhashNearDups — Bench clears between runs). */
  def ivfIndex(embeddings: DataFrame, k: Int = 16, iters: Int = 2): (DataFrame, DataFrame) = {
    val vecs = embeddings.selectExpr("vec_id", "cast(embedding as array<double>) AS v").cache()
    val n = vecs.count()
    val step = math.max(1L, n / k)
    var centroids = vecs.where(s"vec_id % $step = 0 AND vec_id < ${step * k}")
      .selectExpr(s"cast(vec_id / $step as long) AS cid", "v AS c")

    def assign(cents: DataFrame): DataFrame = {
      val scored = vecs.crossJoin(broadcast(cents))
        .selectExpr("vec_id", "cid", s"${cosineE("v", "c")} AS sim")
      val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))
      scored.withColumn("rn", row_number().over(w)).where("rn = 1")
        .select("vec_id", "cid")
    }

    (1 to iters).foreach { _ =>
      val assigned = assign(centroids).join(vecs, "vec_id")
      val means = assigned
        .select(col("cid"), posexplode(col("v")))
        .toDF("cid", "dim", "x")
        .groupBy("cid", "dim").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("c"))
      // empty clusters keep their previous centroid
      centroids = centroids.select(col("cid"), col("c").as("c_old"))
        .join(means, Seq("cid"), "left_outer")
        .selectExpr("cid", "coalesce(c, c_old) AS c")
    }
    (centroids, assign(centroids))
  }

  /** IVF search: rank centroids per query, expand the top-`nprobe`
    * inverted lists, exact cosine + top-k within the candidates. With
    * nprobe = k this is exactly brute force (the spec asserts it). */
  def ivfSearch(embeddings: DataFrame, centroids: DataFrame, assignments: DataFrame,
                queryMaxId: Long = 10, nprobe: Int = 4, k: Int = 5): DataFrame = {
    val vecs = embeddings.selectExpr("vec_id", "cast(embedding as array<double>) AS v")
    val queries = vecs.where(s"vec_id < $queryMaxId").toDF("query_id", "q")
    val qc = queries.crossJoin(broadcast(centroids))
      .selectExpr("query_id", "q", "cid", s"${cosineE("q", "c")} AS csim")
    val wq = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cid"))
    val probes = qc.withColumn("rn", row_number().over(wq)).where(s"rn <= $nprobe")
      .select("query_id", "q", "cid")
    val cands = probes.join(assignments, "cid")
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "q", "vec_id")
    val scored = cands.join(vecs, "vec_id")
      .selectExpr("query_id", "vec_id", s"round(${cosineE("q", "v")}, 6) AS sim")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(s"rank <= $k")
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_cosine_topk" -> ((s, dir) =>
      cosineTopK(Tables.embeddings(s, dir)).orderBy("query_id", "rank")),

    "q25_ann_lsh_buckets" -> ((s, dir) =>
      lshBuckets(Tables.embeddings(s, dir)).orderBy("vec_id")),

    // Bucket-local strong pairs: the ANN join path end-to-end (bucket
    // equi-join + exact cosine + threshold).
    "q26_ann_lsh_pairs" -> ((s, dir) =>
      lshCandidates(Tables.embeddings(s, dir))
        .where("sim >= 0.2")
        .selectExpr("vec_a", "vec_b", "cast(round(sim * 1000000) as bigint) AS sim_e6")
        .orderBy("vec_a", "vec_b")),

    // Per-label embedding centroids (class centroids for curriculum /
    // contrastive sampling). Dimension-wise integer-e3 sums: exact in any
    // shuffle order, so the oracle matches bit for bit.
    "q49_label_centroids" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .selectExpr("label", "transform(cast(embedding as array<double>), x -> cast(round(x * 1000) as bigint)) AS q")
        .select(col("label"), posexplode(col("q")))
        .toDF("label", "dim", "x_e3")
        .groupBy("label", "dim")
        .agg(sum(col("x_e3")).cast("long").as("sum_e3"),
             count(lit(1)).as("n"))
        .orderBy("label", "dim")
    }),

    // IVF probe search (rows-only: Lloyd FP averaging is Spark-internal;
    // exactness anchored by SimilaritySpec's nprobe=k ≡ brute identity).
    "q36_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val (cents, asg) = ivfIndex(e)
      ivfSearch(e, cents, asg).orderBy("query_id", "rank")
    })
  )

  def oracle: Map[String, String] = {
    val duckCos =
      """list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])) /
        |  (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x))))""".stripMargin
    val duckDots = (0 until LshPlanes).map { j =>
      s"list_sum(list_transform(list_zip(q, [${planeElems(j)}]), s -> s[1] * s[2]))"
    }
    val duckBucket = duckDots.zipWithIndex
      .map { case (d, j) => s"CASE WHEN $d >= 0 THEN ${1L << j} ELSE 0 END" }
      .mkString(" + ")
    Map(
      "q49_label_centroids" ->
        """SELECT label, CAST(i - 1 AS INT) AS dim,
          |  CAST(SUM(CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS BIGINT) AS sum_e3,
          |  CAST(COUNT(*) AS BIGINT) AS n
          |FROM (SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings)
          |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
      "q24_cosine_topk" ->
        s"""WITH vecs AS (
           |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
           |    round(list_sum(list_transform(list_zip(q.v, b.v), s -> s[1] * s[2])) /
           |      (sqrt(list_sum(list_transform(q.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS sim
           |  FROM vecs q JOIN vecs b ON q.vec_id < 10 AND b.vec_id <> q.vec_id)
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, sim FROM (
           |  SELECT query_id, vec_id, sim,
           |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
           |  FROM scored) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      "q25_ann_lsh_buckets" ->
        s"""SELECT vec_id, CAST($duckBucket AS BIGINT) AS bucket FROM (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS q
           |  FROM embeddings) ORDER BY vec_id""".stripMargin,
      "q26_ann_lsh_pairs" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST($duckBucket AS BIGINT) AS bucket FROM (
           |    SELECT vec_id, list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS q
           |    FROM embeddings)),
           |vecs AS (
           |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
           |pairs AS (
           |  SELECT ba.vec_id AS vec_a, bb.vec_id AS vec_b
           |  FROM b ba JOIN b bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id)
           |SELECT p.vec_a, p.vec_b,
           |  CAST(round(round($duckCos, 6) * 1000000) AS BIGINT) AS sim_e6
           |FROM pairs p JOIN vecs a ON a.vec_id = p.vec_a JOIN vecs b ON b.vec_id = p.vec_b
           |WHERE round($duckCos, 6) >= 0.2
           |ORDER BY vec_a, vec_b""".stripMargin
    )
  }
}
