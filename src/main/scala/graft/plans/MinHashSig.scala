package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.Portable

/** Native Catalyst expression computing the full 16-element MinHash
  * signature of a shingle array in ONE pass (SURVEY.md §2.10 escape
  * hatch: custom Expression where the built-in surface is too slow).
  *
  * Semantics are bit-identical to the declarative formulation in
  * [[graft.operators.Dedup]] / its DuckDB oracle: per shingle,
  * h = int(first 12 hex chars of md5(utf8)) mod P (= first 6 digest
  * bytes, big-endian), then sig_j = min over shingles of
  * (A_j·h + B_j) mod P. The declarative version walks the shingle array
  * through 16 separate interpreted higher-order transforms plus a
  * string md5→hex→conv round trip; this walks it once with no
  * allocation.
  *
  * `doGenCode` emits a call to the static [[MinHashSig.compute]] — the
  * hot loop is this expression itself, so the win over CodegenFallback
  * is not the loop body but keeping the ENCLOSING projection inside
  * whole-stage codegen (a single fallback expression forces the whole
  * stage back to interpreted row-at-a-time eval).
  *
  * An empty shingle array yields null (there is no minimum over zero
  * shingles), so `nullable` is true regardless of the child's
  * nullability — the default would let Catalyst treat the slot as
  * non-null for a non-nullable child (e.g. a literal `array()` through
  * the registered `graft_minhash_sig` SQL function) and mis-optimize
  * consumers. */
case class MinHashSig(child: Expression, k: Int = Portable.MinhashK)
    extends UnaryExpression {

  require(k >= 1, "minhash_sig: k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen handles the child-null path; the result can ALSO be
    // null (empty array), so re-derive isNull from the computed value.
    val result = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.plans.MinHashSig.compute($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
    result
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** One MD5 instance per executor thread — `compute` runs once per row
    * inside generated code; a fresh `getInstance` per row is measurable. */
  private val mdLocal: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Coefficient arrays per width — computed once per k, shared across
    * threads (immutable after construction). */
  private val coefs = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefsFor(k: Int): (Array[Long], Array[Long]) =
    coefs.computeIfAbsent(k, k =>
      (Array.tabulate(k)(Portable.minhashAj), Array.tabulate(k)(Portable.minhashBj)))

  /** The signature kernel, static so generated Java can call it directly.
    * Returns null for an empty array (see class doc). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val p = Portable.P
    val (a, b) = coefsFor(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      md.reset()
      val digest = md.digest(s.getBytes)
      var h = 0L
      var bi = 0
      while (bi < 6) { h = (h << 8) | (digest(bi) & 0xffL); bi += 1 } // = conv(hex[0:12],16,10)
      h %= p
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Register `graft_minhash_sig` on the session's function registry so
    * it is usable from selectExpr/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_minhash_sig")(exprs => MinHashSig(exprs.head))
}
