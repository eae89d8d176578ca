package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression computing ALL band signatures of a quantized vector
  * against a fixed hyperplane set in one compiled pass.
  *
  * Input: `array<bigint>` (the e3-quantized embedding). Output:
  * `array<string>` of length `bands`; element b is the sign-bit bucket
  * string of band b — character `bit` is '1' iff
  * dot(q, plane(b·nbits + bit)) >= 0, in bit order. Bucket identity as a
  * bit STRING (not an integer) keeps the formula trivially identical in
  * the DuckDB oracle (string_agg of CASE bits) with no 2^bit arithmetic
  * to keep exact, and supports any nbits without overflow.
  *
  * Same rationale as [[CentroidSims]]: the declarative spelling walks
  * bands·nbits·dim interpreted lambda steps per row (≥48·64 ≈ 3k boxed
  * invocations at default shape); this is a primitive-long loop inside
  * whole-stage codegen. Dot products are exact int64 (±1 planes ×
  * e3-quantized components, |dot| ≤ dim·max|q| ≪ 2^53).
  *
  * Returns null when the vector length differs from the planes'
  * dimension, hence `nullable = true`. */
case class LshBandSigs(child: Expression, planes: Seq[Seq[Long]], bands: Int)
  extends UnaryExpression {

  require(bands > 0 && planes.nonEmpty && planes.length % bands == 0,
    s"planes (${planes.length}) must split evenly into $bands bands")
  require(planes.forall(_.length == planes.head.length),
    "plane matrix must be rectangular")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_sigs expects array<bigint>, got $other")
  }

  @transient private lazy val nbits: Int = planes.length / bands
  @transient private lazy val dim: Int = planes.head.length
  /** Row-major (bands·nbits)×dim plane matrix in primitive longs. */
  @transient private lazy val flat: Array[Long] = planes.flatten.toArray

  def compute(arr: ArrayData): ArrayData = {
    if (arr.numElements() != dim) return null
    val q = arr.toLongArray()
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val sb = new Array[Byte](nbits)
      var bit = 0
      while (bit < nbits) {
        val off = (b * nbits + bit) * dim
        var dot = 0L
        var d = 0
        while (d < dim) { dot += q(d) * flat(off + d); d += 1 }
        sb(bit) = if (dot >= 0L) '1' else '0'
        bit += 1
      }
      out(b) = UTF8String.fromBytes(sb)
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBandSigs", this, classOf[LshBandSigs].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
