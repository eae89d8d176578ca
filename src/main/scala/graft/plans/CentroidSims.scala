package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression scoring one integer-quantized vector
  * against EVERY centroid of an IVF model in a single compiled loop
  * (SURVEY.md §2.10 escape hatch, same rationale as [[MinHashSig]]).
  *
  * The declarative twin — `transform(matrix, c -> aggregate(zip_with(q,
  * c, ...), ...))` — is semantically right but runs on the interpreted
  * higher-order-function path: one boxed lambda invocation per matrix
  * element per row (k·dim = 1024 per row at k=16), which round-3
  * profiling measured at ~3.5 s of the q36 bench on its own. This
  * expression does the same arithmetic in primitive longs/doubles and,
  * via `doGenCode`, keeps the enclosing projection inside whole-stage
  * codegen.
  *
  * Arithmetic is bit-identical to the declarative version (and therefore
  * to the DuckDB oracle): dot and both squared norms are EXACT int64
  * sums (components are e3-quantized, partial sums < 2^53); the only
  * float steps are two sqrts, one multiply and one divide from exact
  * integer inputs — IEEE-deterministic everywhere. Returns the k raw
  * (unrounded) similarities in centroid order; callers apply Spark's own
  * `round(_, 6)` so the rounding rule is Spark's, not ours.
  *
  * Returns null for a vector whose length differs from the model's
  * dimension (no meaningful score exists), hence `nullable = true`. */
case class CentroidSims(child: Expression, cents: Seq[Seq[Long]]) extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
    "centroid matrix must be non-empty and rectangular")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_sims expects array<bigint>, got $other")
  }

  @transient private lazy val k: Int = cents.length
  @transient private lazy val dim: Int = cents.head.length
  /** Row-major k×dim matrix in primitive longs. */
  @transient private lazy val flat: Array[Long] = cents.flatten.toArray
  /** sqrt of each centroid's exact int64 squared norm. */
  @transient private lazy val norms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum.toDouble)).toArray

  def compute(arr: ArrayData): ArrayData = {
    if (arr.numElements() != dim) return null
    val q = arr.toLongArray()
    var nq = 0L
    var i = 0
    while (i < dim) { nq += q(i) * q(i); i += 1 }
    val sn = math.sqrt(nq.toDouble)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val off = j * dim
      var dot = 0L
      var d = 0
      while (d < dim) { dot += q(d) * flat(off + d); d += 1 }
      out(j) = dot / (sn * norms(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the model lives on this expression instance; reference it from the
    // generated code (the matrix is a model — k·dim longs — not data)
    val ref = ctx.addReferenceObj("centroidSims", this, classOf[CentroidSims].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
