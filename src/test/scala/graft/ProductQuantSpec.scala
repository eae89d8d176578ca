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
}
