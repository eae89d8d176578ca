package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character-n-gram extraction — the gram materializer
  * of the brute-force near-dup verifier (q21).
  *
  * Replaces `array_distinct(transform(sequence(1, length(text) - n + 1),
  * i -> substring(text, i, n)))`. Higher-order functions are
  * CodegenFallback: that spelling interpreted-evals a fresh `Substring`
  * per element — ~10k interpreted eval calls per 10 KB document, tens of
  * millions per block — which is exactly the code shape whose speed
  * depends on how far the C2 JIT has tiered up (observed 6.5 s → 0.7 s
  * across bench reps on identical input). One compiled loop per row
  * removes both the cost and the variance.
  *
  * Semantics match the declarative spelling on its guarded domain
  * (`length(text) >= n`, enforced by every call site): code-point
  * indexing like SQL `substring`, first-occurrence order like
  * `array_distinct`. For `length(text) < n` the declarative form
  * inherits `sequence`'s descending-range surprise (sequence(1, 0) =
  * [1, 0]); this returns the empty array instead — the sane contract,
  * documented here because it is the one deliberate divergence. */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_shingles expects a string column, got $other")
    }

  def compute(s: UTF8String): GenericArrayData = {
    // code points, not chars: SQL substring counts code points, so a
    // supplementary-plane character is one position, not two
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((len - n + 1) * 2)
    var i = 0
    while (i <= len - n) {
      seen.add(new String(cps, i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charShingles", this, classOf[CharShingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {
  /** SQL registration: `graft_char_shingles(text, n)` (n a foldable int). */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_char_shingles")(
      { exprs =>
        require(exprs.length == 2, "graft_char_shingles(text, n)")
        val n = exprs(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"shingle width must be a literal int, got $other")
        }
        CharShingles(exprs.head, n)
      })
}
