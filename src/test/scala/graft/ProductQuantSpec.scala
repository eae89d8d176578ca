package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuant
import org.apache.spark.sql.graft.ColumnBridge

/** Product quantization: native-kernel bit-identity, encode/search
  * invariants. */
class ProductQuantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val cents = ProductQuant.pqTrain(emb)

  test("PqCodes matches the declarative argmin twin bit for bit") {
    val qdf = emb.selectExpr("vec_id",
      "transform(cast(embedding as array<double>), x -> cast(round(x * 1000) as bigint)) AS q")
    // declarative twin: per subspace, argmin over exact integer L2
    val centsSql = cents.map(_.map(_.mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")).mkString("array(", ",", ")")
    val twin = expr(
      s"""transform(sequence(0, ${ProductQuant.M - 1}, 1), s ->
         |  cast(array_position(
         |    transform($centsSql[s], c ->
         |      aggregate(zip_with(slice(q, s * ${ProductQuant.SubDim} + 1, ${ProductQuant.SubDim}), c,
         |        (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)),
         |    array_min(transform($centsSql[s], c ->
         |      aggregate(zip_with(slice(q, s * ${ProductQuant.SubDim} + 1, ${ProductQuant.SubDim}), c,
         |        (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)))) - 1 as int))""".stripMargin)
    val native = ColumnBridge.column(graft.plans.PqCodes(
      ColumnBridge.expression(col("q")), cents))
    val diff = qdf.select(native.as("a"), twin.as("b"))
      .where(expr("a IS DISTINCT FROM b")).count()
    assert(diff == 0)
  }

  test("identical vectors encode to identical codes; codes are in range") {
    val codes = ProductQuant.pqEncode(emb, cents)
    val doubled = ProductQuant.pqEncode(
      emb.selectExpr("vec_id + 1000000 AS vec_id", "embedding"), cents)
      .selectExpr("vec_id - 1000000 AS vec_id", "codes AS codes2")
    assert(codes.join(doubled, "vec_id")
      .where(expr("codes IS DISTINCT FROM codes2")).count() == 0)
    val bad = codes.where(expr(
      s"exists(codes, c -> c < 0 OR c >= ${ProductQuant.K})")).count()
    assert(bad == 0)
    assert(codes.where(expr(s"size(codes) != ${ProductQuant.M}")).count() == 0)
  }

  test("ADC is the exact distance to the reconstruction, and search output is well-formed") {
    // ADC(q, codes) == squared L2 between q and concat(cents[s][codes[s]])
    val centsSql = cents.map(_.map(_.mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")).mkString("array(", ",", ")")
    val qdf = emb.limit(50).selectExpr("vec_id",
      "transform(cast(embedding as array<double>), x -> cast(round(x * 1000) as bigint)) AS q")
      .withColumn("codes", ColumnBridge.column(graft.plans.PqCodes(
        ColumnBridge.expression(col("q")), cents)))
    val adc = ColumnBridge.column(graft.plans.PqAdc(
      ColumnBridge.expression(col("q")), ColumnBridge.expression(col("codes")), cents))
    val recon = expr(
      s"""aggregate(zip_with(q,
         |  flatten(transform(sequence(0, ${ProductQuant.M - 1}, 1), s -> $centsSql[s][codes[s]])),
         |  (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)""".stripMargin)
    assert(qdf.select(adc.as("a"), recon.as("b"))
      .where(expr("a IS DISTINCT FROM b")).count() == 0)

    val out = ProductQuant.pqSearch(emb, cents).collect()
    assert(out.length == 50) // 10 queries × top-5
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 5 && r.getLong(3) >= 0))
  }

  test("dimension mismatch yields null, not a wrong answer") {
    val bad = spark.sql("SELECT array(1L, 2L, 3L) AS q")
      .select(ColumnBridge.column(graft.plans.PqCodes(
        ColumnBridge.expression(col("q")), cents)).as("codes"))
    assert(bad.head().isNullAt(0))
  }

  test("int8 codes are in [-127,127], extreme components hit ±127, zero dims encode 0") {
    import spark.implicits._
    // dim 0: values in [-2, 4]; dim 1: all zero; dim 2: [-8, 8]
    val vecs = Seq(
      (0L, Array(4.0f, 0.0f, -8.0f)),
      (1L, Array(-2.0f, 0.0f, 8.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val scales = ProductQuant.int8Scales(vecs)
    assert(scales.toSeq == Seq(4.0, 0.0, 8.0))
    val codes = ProductQuant.int8Encode(vecs, scales)
      .orderBy("vec_id").collect().map(_.getSeq[Long](2))
    assert(codes(0) == Seq(127L, 0L, -127L))   // max-abs components → ±127
    assert(codes(1) == Seq(-63L, 0L, 127L))    // trunc(-2/4*127) = trunc(-63.5) = -63
    assert(codes(2) == Seq(31L, 0L, 0L))       // trunc(1/4*127) = 31
    assert(codes.flatten.forall(c => c >= -127L && c <= 127L))
  }

  test("int8 dot-product top-1 recovers the float-cosine nearest neighbor on separated clusters") {
    import spark.implicits._
    // two well-separated directions; query 0 belongs to cluster A
    val rnd = new scala.util.Random(7)
    def vec(base: Array[Float], jitter: Float) =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * jitter)
    val a = Array.fill(8)(1.0f) ++ Array.fill(8)(0.0f)
    val b = Array.fill(8)(0.0f) ++ Array.fill(8)(1.0f)
    val rows = ((0L until 4L).map(i => (i, vec(a, 0.1f))) ++
      (4L until 8L).map(i => (i, vec(b, 0.1f)))).toSeq
    val clusters = rows.toDF("vec_id", "embedding")
    val top1 = ProductQuant.int8TopK(clusters, queryMaxId = 1, k = 1).collect()
    assert(top1.length == 1)
    assert(top1.head.getLong(2) < 4L, // nearest neighbor is in cluster A
      s"int8 top-1 crossed clusters: ${top1.head}")
  }
}
