package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native per-mille Jaccard between two string arrays — the exact
  * confirmation kernel of every text near-dup path (q21 brute-force
  * verifier, q22 MinHash confirm, q53/q59 cluster edges).
  *
  * Replaces `cast(round(1000.0 * size(array_intersect(a, b)) /
  * size(array_union(a, b))) as bigint)`, whose interpreted set
  * intersection/union built boxed hash sets per PAIR per OPERATOR (two
  * full passes). This computes |A∩B| and |A∪B| over distinct elements
  * in one hash-set pass and reproduces Spark's exact rounding —
  * `java.math.BigDecimal.valueOf(x).setScale(0, HALF_UP)` is the Round
  * expression's own double path, so the result is bit-identical to the
  * declarative spelling (and to the DuckDB twin that has hash-matched
  * it for three rounds). Distinct-set semantics match
  * array_intersect/array_union even on inputs with duplicates.
  *
  * Null if either array is null (BinaryExpression default); 0/0 (two
  * empty arrays) yields the same NaN→cast behavior as the declarative
  * version via the identical double division. */
case class JaccardMille(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaccard_mille expects (array<string>, array<string>), got $other")
    }

  def compute(l: ArrayData, r: ArrayData): Any = {
    val a = new java.util.HashSet[Any]()
    var i = 0
    val nl = l.numElements()
    while (i < nl) { a.add(l.getUTF8String(i)); i += 1 }
    val b = new java.util.HashSet[Any]()
    var inter = 0
    i = 0
    val nr = r.numElements()
    while (i < nr) {
      val s = r.getUTF8String(i)
      if (b.add(s) && a.contains(s)) inter += 1
      i += 1
    }
    val union = a.size + b.size - inter
    val x = 1000.0 * inter / union
    if (x.isNaN || x.isInfinite) null
    else JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP).longValue()
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardMille", this, classOf[JaccardMille].getName)
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
