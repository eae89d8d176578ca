package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass kernel for q176's Gopher n-gram statistics over a
  * token array: returns `array<long>` of
  * `[n_chars, top2_mass, top3_mass, top4_mass, dupc5 .. dupc10]`
  * (10 values), where top-n mass = count × gram length of the MOST
  * COMMON n-gram (ties on count resolved toward the longer gram — the
  * same (count, length) lexicographic rule the declarative fold packed
  * into one integer) and dupc-n = occurrence-weighted char mass of
  * n-grams occurring ≥ 2 times; gram length includes separator spaces
  * and n_chars is the space-joined text length.
  *
  * Value-identical to the nine `aggregate(array_sort(...))` folds it
  * replaces — but those lambdas are CodegenFallback and their
  * interpreted per-element eval cost ~2 ms/doc (the q21/q69 lesson,
  * third sighting): measured 10.2 s for the sf0.1 corpus vs ~0.3 s for
  * this kernel. One token walk builds each width's count map directly;
  * no sort, no per-element lambda dispatch. */
case class GopherNgramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_ngram_stats expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    GopherNgramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GopherNgramStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherNgramStats {

  /** Static kernel so generated Java calls it directly. All char
    * masses count Unicode CODE POINTS (String.codePointCount) — the
    * semantics of `length()` in both Spark and DuckDB and of the
    * replaced fold; UTF-16 code units would diverge on non-BMP text
    * (the DupRunStats note). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    var tokChars = 0L
    while (i < n) {
      toks(i) = arr.getUTF8String(i).toString
      tokChars += toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    val out = new Array[Long](10)
    out(0) = if (n == 0) 0L else tokChars + (n - 1) // array_join(toks, ' ')
    var g = 2
    while (g <= 10) {
      if (n >= g) {
        val counts = new java.util.HashMap[String, Long](2 * (n - g + 1))
        var j = 0
        while (j <= n - g) {
          val sb = new java.lang.StringBuilder()
          var k = 0
          while (k < g) {
            if (k > 0) sb.append(' ')
            sb.append(toks(j + k))
            k += 1
          }
          counts.merge(sb.toString, 1L, (a, b) => a + b)
          j += 1
        }
        if (g <= 4) {
          // most common gram; tie on count -> longer gram (the packed
          // (count, length) lexicographic max of the declarative fold)
          var bestC = 0L
          var bestL = 0L
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue
            val k = e.getKey
            val l = k.codePointCount(0, k.length).toLong
            if (c > bestC || (c == bestC && l > bestL)) { bestC = c; bestL = l }
          }
          out(g - 1) = bestC * bestL
        } else {
          var dupc = 0L
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue >= 2L) {
              val k = e.getKey
              dupc += e.getValue * k.codePointCount(0, k.length)
            }
          }
          out(g - 1) = dupc
        }
      }
      g += 1
    }
    new GenericArrayData(out)
  }
}
