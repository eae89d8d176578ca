package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity between two array<double> columns — the
  * confirm-step kernel of every exact-scoring path (q24 brute force,
  * q26/q59 candidate confirmation, q36 probe scoring).
  *
  * Arithmetic is ORDER-IDENTICAL to the declarative spelling it
  * replaces (`aggregate(zip_with(a, b, *), 0D, +) / (sqrt(·)·sqrt(·))`,
  * and to the DuckDB twin's `list_sum(list_transform(list_zip(...)))`):
  * three separate left-to-right index-order folds for dot, |a|², |b|²,
  * then dab / (sqrt(daa) * sqrt(dbb)) in that exact operation order —
  * so every rounded-6 output the oracle hash-checks is bit-unchanged.
  * The declarative twin ran three interpreted boxed folds per PAIR
  * (≥192 lambda invocations at dim 64); callers sit on the candidate
  * join's hot path.
  *
  * Null for length-mismatched inputs (no meaningful cosine), hence
  * `nullable = true`. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got $other")
    }

  def compute(l: ArrayData, r: ArrayData): Any = {
    val n = l.numElements()
    if (n != r.numElements()) return null
    val a = l.toDoubleArray()
    val b = r.toDoubleArray()
    var dab = 0d; var daa = 0d; var dbb = 0d
    var i = 0
    while (i < n) { dab += a(i) * b(i); i += 1 }
    i = 0
    while (i < n) { daa += a(i) * a(i); i += 1 }
    i = 0
    while (i < n) { dbb += b(i) * b(i); i += 1 }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""
         |Object result = $ref.compute($l, $r);
         |${ev.isNull} = (result == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : ((Double) result).doubleValue();
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Register `graft_cosine_sim` on the session's function registry so it
    * is usable from selectExpr/SQL. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registry.once(spark, "graft_cosine_sim")(exprs => CosineSim(exprs(0), exprs(1)))
}
