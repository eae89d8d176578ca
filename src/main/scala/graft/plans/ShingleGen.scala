package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator (UDTF): word n-gram shingles of a text column as
  * rows — `graft_shingles(text, n)` emits (pos, shingle) without ever
  * materializing the intermediate token/shingle ARRAYS as columns (the
  * declarative path tokenizes into an array, transforms it into a
  * second array, then explodes — three allocations per row before the
  * generate).
  *
  * Completes the §2.10 extension surface with the fourth kind: scalar
  * UDF (ImageOps), UDAF (ReassembleBytes), native Expression
  * (MinHashSig/CentroidSims/LshBandSigs/CosineSim/JaccardMille), and
  * now a true Generator, registered on the session registry like the
  * others. Tokenization is the canonical whitespace rule
  * ([[graft.functions.Portable.sparkToks]]'s semantics: trim, split on
  * runs of whitespace) so the emitted shingles are bit-identical to
  * [[graft.operators.Dedup.shingled]]'s for n = 2 (spec-checked).
  *
  * Generators are not expression-codegen'd by Spark (GenerateExec
  * drives them row-at-a-time), so CodegenFallback here is the normal
  * cost model, not a regression. */
case class ShingleGen(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (string, int literal), got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // trim + split on whitespace runs — split(trim(text), '\s+') semantics,
    // including its single-empty-token result for all-whitespace input
    val toks = v.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    if (toks.length < n) return Nil
    (0 to toks.length - n).iterator.map { i =>
      InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleGen {
  /** Register `graft_shingles` so `SELECT graft_shingles(text, 2)` and
    * LATERAL VIEW work from SQL. The second argument must be an integer
    * literal (it is part of the generator's shape). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registry.once(spark, "graft_shingles")(
      exprs => ShingleGen(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue()))
}
