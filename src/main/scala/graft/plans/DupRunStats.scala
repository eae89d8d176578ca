package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native duplicate-mass kernel for q168 over a string array: returns
  * `array<long>` of `[n, chars, dupn, dupc]` — element count, total
  * char mass, and for every distinct value occurring c ≥ 2 times its c
  * occurrences (dupn) and c·length chars (dupc). Value-identical to the
  * `aggregate(array_sort(...))` run fold it replaces (one count map
  * instead of a sort + interpreted per-element lambda — the
  * [[GopherNgramStats]] lesson applied to the line/paragraph gate). */
case class DupRunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dup_run_stats expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    DupRunStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.DupRunStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DupRunStats {

  /** Static kernel so generated Java calls it directly. Char masses
    * count Unicode CODE POINTS (String.codePointCount), not UTF-16
    * code units — `length()` in both Spark and DuckDB is code-point
    * semantics, and the replaced fold used it, so a String.length here
    * would diverge cross-engine on any non-BMP text (emoji,
    * supplementary CJK — routine in web-scale curation corpora). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[String, Long](2 * n)
    var chars = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      chars += s.codePointCount(0, s.length)
      counts.merge(s, 1L, (a, b) => a + b)
      i += 1
    }
    var dupn = 0L
    var dupc = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2L) {
        val k = e.getKey
        dupn += e.getValue
        dupc += e.getValue * k.codePointCount(0, k.length)
      }
    }
    new GenericArrayData(Array(n.toLong, chars, dupn, dupc))
  }
}
