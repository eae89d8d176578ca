package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a driver-built Bloom filter — the
  * map-side prefilter that turns a corpus-wide anti-join into a narrow
  * scan plus a candidate-sized join (Curation.bloomDecontaminate).
  *
  * The sketch rides the plan as ONE reference object (addReferenceObj),
  * not as parsed literals — there is no Catalyst parse/analyze cost at
  * any sketch size, the lesson of round 2's q36 finding. Codegen is a
  * single virtual call inside whole-stage codegen; no boxing, no UDF
  * serialization per batch.
  *
  * Semantics: `mightContainLong` — TRUE is "maybe present" (subject to
  * the filter's false-positive rate), FALSE is DEFINITELY absent. Any
  * rewrite using it must therefore only use the FALSE branch to skip
  * exact work, which is what keeps bloom-prefiltered decontamination
  * byte-identical to the plain anti-join. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects BIGINT, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
