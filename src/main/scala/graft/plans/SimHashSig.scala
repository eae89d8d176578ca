package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 48-bit SimHash over a token array in ONE pass.
  *
  * Bit-identical to the declarative spelling in
  * [[graft.operators.Dedup.simhash]] (and its DuckDB twin, hash-green
  * since round 1): distinct tokens, h = first 12 hex chars of md5
  * (= first 6 digest bytes big-endian), per bit b in 0..47 count +1 if
  * bit set else −1, signature has bit b set iff the count is positive.
  * The declarative version pays 48 interpreted aggregate passes PLUS an
  * interpreted per-token md5→hex→conv inside a transform lambda; this
  * walks the tokens once with two tight loops — the ~8× fan-out of
  * q69's five signature-consuming branches made that interpreted cost
  * the whole query.
  *
  * Empty array → 0L (no votes, no bits set), matching the declarative
  * aggregate's zero-element fold; callers additionally guard
  * `size(toks) >= 1` so the case never reaches the oracle. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash_sig expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {

  private val mdLocal: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static kernel so generated Java calls it directly. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[Object](n * 2) // distinct TOKENS, like array_distinct
    val counts = new Array[Int](48)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (seen.add(s)) {
        md.reset()
        val digest = md.digest(s.getBytes)
        var h = 0L
        var bi = 0
        while (bi < 6) { h = (h << 8) | (digest(bi) & 0xffL); bi += 1 }
        var b = 0
        while (b < 48) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 48) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** Register `graft_simhash_sig(toks)` for selectExpr/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_simhash_sig")(exprs => SimHashSig(exprs.head))
}
