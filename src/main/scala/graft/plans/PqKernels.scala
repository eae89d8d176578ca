package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (native Catalyst expressions, §2.10
  * escape hatch — same rationale as [[CentroidSims]]: the declarative
  * HOF spelling runs interpreted per matrix element, and these loops
  * sit on every row of the corpus).
  *
  * The codebook layout is m subspaces × k centroids × subdim
  * components, integer-e3 quantized so every distance is an EXACT
  * int64 sum — the whole PQ pipeline (train, encode, ADC search) is
  * therefore DuckDB-oracle-checkable with no floating-point hazards.
  * Distances are SQUARED L2 (the canonical PQ metric; monotonic with
  * L2, so rankings are identical and no sqrt is needed). */
object PqKernels {
  /** Flatten an m×k×subdim codebook row-major; validates rectangularity. */
  def flatten(cents: Seq[Seq[Seq[Long]]]): (Array[Long], Int, Int, Int) = {
    require(cents.nonEmpty && cents.forall(_.nonEmpty), "empty codebook")
    val m = cents.length
    val k = cents.head.length
    val subdim = cents.head.head.length
    require(cents.forall(s => s.length == k && s.forall(_.length == subdim)),
      "codebook must be rectangular m×k×subdim")
    (cents.flatten.flatten.toArray, m, k, subdim)
  }
}

/** `q (array<bigint>, length m·subdim)` → `array<int>` of m codes: per
  * subspace, the centroid index minimizing exact squared L2 distance,
  * ties to the smallest index. One compiled m·k·subdim loop per row;
  * null for a dimension mismatch. */
case class PqCodes(child: Expression, cents: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  @transient private lazy val (flat, m, k, subdim) = PqKernels.flatten(cents)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<bigint>, got $other")
  }

  def compute(arr: ArrayData): ArrayData = {
    if (arr.numElements() != m * subdim) return null
    val q = arr.toLongArray()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val qOff = s * subdim
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        val cOff = (s * k + c) * subdim
        var d = 0L
        var i = 0
        while (i < subdim) {
          val diff = q(qOff + i) - flat(cOff + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict: ties keep smaller c
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `(query q: array<bigint>, codes: array<int>)` → asymmetric-distance
  * score: Σ_s squaredL2(q_s, cents[s][codes[s]]) as an exact int64 —
  * the ADC inner loop of a PQ search, one compiled pass per
  * (query, candidate) pair. Null for dimension/code-range mismatches. */
case class PqAdc(left: Expression, right: Expression, cents: Seq[Seq[Seq[Long]]])
    extends BinaryExpression {

  @transient private lazy val (flat, m, k, subdim) = PqKernels.flatten(cents)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<bigint>, array<int>), got $other")
    }

  def compute(qArr: ArrayData, codesArr: ArrayData): Any = {
    if (qArr.numElements() != m * subdim || codesArr.numElements() != m) return null
    val q = qArr.toLongArray()
    val codes = codesArr.toIntArray()
    var total = 0L
    var s = 0
    while (s < m) {
      val c = codes(s)
      if (c < 0 || c >= k) return null
      val qOff = s * subdim
      val cOff = (s * k + c) * subdim
      var i = 0
      while (i < subdim) {
        val diff = q(qOff + i) - flat(cOff + i)
        total += diff * diff
        i += 1
      }
      s += 1
    }
    total
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""
         |Object result = $ref.compute($l, $r);
         |${ev.isNull} = (result == null);
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) result).longValue();
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
