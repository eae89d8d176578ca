package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SHIPPED-ARTIFACT tokenizer apply path (q188/q189): the trained
  * model — a k-row merge list for BPE, a (multiVocab + alphabet)-row
  * piece inventory for WordPiece — is the genuinely CONSTANT-size
  * artifact a tokenizer deploys with (merges.txt / vocab.txt in every
  * published checkpoint), and it rides to executors INSIDE this
  * expression as a codegen reference object. The corpus scan therefore
  * never joins anything: apply is a pure narrow map, one pass over
  * `text`, no seg-frame shuffle, no AQE decision to make — the
  * 100 TB-safe alternative the in-situ seg-join path (q144/q174, kept
  * as the training-evaluation shape, ScaleCheck `tokenizer_apply`)
  * cannot be once word TYPES outgrow a broadcast.
  *
  * Exactness contract: per-word token counts equal the per-TYPE counts
  * the training loop materializes —
  *  - BPE: applying the learned merges IN ORDER to a word reproduces
  *    its training segmentation (the frequency-gap batch is provably
  *    merge-for-merge ≡ sequential, `Bpe.trainSymsBatched`), with the
  *    same greedy-left overlap alternation on self-pairs (a,a);
  *  - WordPiece: greedy longest-match from the same piece inventory is
  *    deterministic — no tie exists (lengths are distinct per
  *    position).
  * Both walk Unicode CODE POINTS (the training loop's `split(w, '')` /
  * `substring` semantics and DuckDB's `length()` — the DupRunStats
  * lesson), and word splitting replicates `split(trim(text), '\s+')`
  * exactly: trim strips 0x20 only, `\s` is the ASCII class, empty
  * fragments drop. TokenizerKernelSpec pins kernel ≡ join row-for-row
  * on the real corpus plus the alternation/emoji edge cases; the
  * oracle gate re-proves it cross-engine at three SFs (q188/q189 reuse
  * q144/q174's DuckDB twins verbatim).
  *
  * Per-word memoization: natural text repeats word types heavily
  * (Zipf), so each deserialized model instance carries a bounded
  * transient cache (task-local by construction — reference objects are
  * deserialized per task binary); past the cap it computes without
  * caching rather than grow the heap. */
sealed trait TokenizerModel extends Serializable {

  /** The model's exact per-word result, packed however the family
    * chooses (BPE/WordPiece: the token count itself; unigram: the
    * q180 packed (score, tokens) integer). [[tokensOf]]/[[scoreOf]]
    * decode it — keeping ONE cached long per word type regardless of
    * how many channels the family carries. */
  def wordValue(word: String): Long

  /** Token count decoded from [[wordValue]]'s packing. */
  def tokensOf(v: Long): Long = v

  /** e6 path score decoded from [[wordValue]]'s packing (families
    * without a score channel report 0 and their queries ignore it). */
  def scoreOf(v: Long): Long = 0L

  /** Convenience: the per-word token count. */
  final def tokenCount(word: String): Long = tokensOf(wordValue(word))

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def cachedValue(word: String): Long = {
    val hit = cache.get(word)
    if (hit != null) return hit.longValue()
    val n = wordValue(word)
    // SOFT cap: the size check and the insert are not atomic, so tasks
    // sharing one deserialized instance can overshoot CacheCap by at
    // most the thread count — bounded and harmless; a strict cap would
    // put a lock on the per-word hot path.
    if (cache.size < TokenizerModel.CacheCap) cache.putIfAbsent(word, n)
    n
  }

  /** `[n_words, n_tokens, n_chars, score_e6]` over a whole document —
    * replicates `explode(split(trim(text), '\s+'))` + the per-word
    * counts in one narrow pass. n_chars counts code points of the kept
    * words (the fertility denominature). */
  final def docCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    // Spark's trim() strips 0x20 only (NOT Java String.trim's <= 0x20)
    var st = 0
    var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    val words = s.substring(st, en).split("\\s+", -1)
    var nW = 0L
    var nT = 0L
    var nC = 0L
    var sc = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val v = cachedValue(w)
        nW += 1
        nT += tokensOf(v)
        sc += scoreOf(v)
        nC += w.codePointCount(0, w.length)
      }
      i += 1
    }
    new GenericArrayData(Array(nW, nT, nC, sc))
  }
}

object TokenizerModel {
  /** Per-instance word-cache cap — bounded so a pathological all-distinct
    * corpus (the ScaleCheck synthetic) cannot grow a task's heap; real
    * text saturates hit-rate far below it. */
  val CacheCap = 1 << 16

  /** Code-point split — the semantics of the training loop's
    * `split(w, '')` (Java regex zero-width matches advance by code
    * point, so surrogate pairs never split). */
  private[plans] def codePoints(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var j = 0
    while (i < w.length) {
      val l = Character.charCount(w.codePointAt(i))
      out(j) = w.substring(i, i + l)
      j += 1
      i += l
    }
    out
  }
}

/** BPE encoder: apply the learned merges in order; within one merge
  * pass, occurrences are matched on the PRE-pass symbol sequence and
  * overlaps (only possible when a = b) resolve greedy-left by skipping
  * past each merged pair — exactly the training loop's run-alternation
  * (`Bpe.trainSymsBatched`'s `(pos − run_min) % 2 = 0` keep rule).
  * O(|word| × k) per uncached word type: fine at the oracle k and
  * honest at a 32k-merge production vocabulary only because the type
  * cache amortizes it per task — a latency-critical deployment would
  * use the priority-queue encoder (same output by the same argument);
  * this kernel optimizes for provable equivalence to the trained
  * segmentation. */
final class BpeEncodeModel(val mergeA: Array[String], val mergeB: Array[String])
    extends TokenizerModel {
  require(mergeA.length == mergeB.length)

  override def wordValue(word: String): Long = {
    var syms: Array[String] = TokenizerModel.codePoints(word)
    var m = 0
    while (m < mergeA.length && syms.length > 1) {
      val a = mergeA(m)
      val b = mergeB(m)
      var i = 0
      var j = 0
      val out = new Array[String](syms.length)
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out(j) = syms(i) + syms(i + 1)
          i += 2
        } else {
          out(j) = syms(i)
          i += 1
        }
        j += 1
      }
      if (j < syms.length) syms = java.util.Arrays.copyOf(out, j)
      m += 1
    }
    syms.length.toLong
  }
}

/** WordPiece/MaxMatch encoder: longest in-inventory piece at each
  * position, positions in code points (the training candidates'
  * `substring` semantics). A code point absent from the inventory
  * consumes one token — the "single chars are always in-vocab" total-
  * coverage rule extended to unseen alphabet, so the encoder is total
  * on any input (on the training corpus itself the fallback never
  * fires and kernel ≡ seg-join exactly). */
final class WordPieceEncodeModel(val pieces: Array[String], val maxPieceLen: Int)
    extends TokenizerModel {

  @transient private lazy val inventory: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](2 * pieces.length)
    pieces.foreach(s.add)
    s
  }

  override def wordValue(word: String): Long = {
    val cps = TokenizerModel.codePoints(word)
    var pos = 0
    var n = 0L
    while (pos < cps.length) {
      var step = 1
      var l = math.min(maxPieceLen, cps.length - pos)
      var found = false
      while (l >= 2 && !found) {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < l) { sb.append(cps(pos + k)); k += 1 }
        if (inventory.contains(sb.toString)) { step = l; found = true }
        l -= 1
      }
      pos += step
      n += 1
    }
    n
  }
}

/** Unigram/Viterbi encoder (q194): the scored piece inventory — the
  * vocab.txt + scores pair a SentencePiece unigram model ships —
  * decoded per word by the SAME packed-integer DP q180 runs in-plan:
  * best(i) = max over l of best(i−l) + s_e6·1024 − 1 from
  * best(0) = (Off·1024 + 1023), so integer MAX is the (max score,
  * min tokens) tie-break and the packed result carries BOTH channels
  * ([[tokensOf]]/[[scoreOf]] decode them) — bit-identical to the
  * in-plan fold and the recursive twin by construction. An
  * unreachable position (possible only under a PRUNED vocabulary)
  * carries the q180 null semantics: no arm extends from it, longer
  * pieces span over it. Totality off-corpus: an l=1 arm whose code
  * point is missing from the inventory scores [[UnigramEncodeModel.UnkScoreE6]]
  * (never reachable on the training corpus, where every seen char is
  * in-vocab); the 1023-char packed budget fails LOUDLY, matching both
  * engines' in-plan guards. */
final class UnigramEncodeModel(val pieces: Array[String],
    val scoresE6: Array[Long], val maxPieceLen: Int) extends TokenizerModel {
  require(pieces.length == scoresE6.length)

  private val Off = 1000000000000L

  @transient private lazy val inventory: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](2 * pieces.length)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), scoresE6(i)); i += 1 }
    m
  }

  override def tokensOf(v: Long): Long = 1023L - (v % 1024L)
  override def scoreOf(v: Long): Long = (v / 1024L) - Off

  override def wordValue(word: String): Long = {
    val cps = TokenizerModel.codePoints(word)
    val n = cps.length
    if (n > 1023)
      throw new IllegalArgumentException(
        s"unigram: word past the 1023-char packed budget: $word")
    val best = new Array[Long](n + 1)
    val reach = new Array[Boolean](n + 1)
    best(0) = Off * 1024L + 1023L
    reach(0) = true
    var i = 1
    while (i <= n) {
      var b = Long.MinValue
      var r = false
      val maxL = math.min(maxPieceLen, i)
      var l = 1
      while (l <= maxL) {
        if (reach(i - l)) {
          val sb = new java.lang.StringBuilder()
          var k = i - l
          while (k < i) { sb.append(cps(k)); k += 1 }
          val sc = inventory.get(sb.toString)
          val scV =
            if (sc != null) sc.longValue()
            else if (l == 1) UnigramEncodeModel.UnkScoreE6
            else Long.MinValue
          if (scV != Long.MinValue) {
            val v = best(i - l) + scV * 1024L - 1L
            if (v > b) { b = v; r = true }
          }
        }
        l += 1
      }
      best(i) = b
      reach(i) = r
      i += 1
    }
    best(n)
  }
}

object UnigramEncodeModel {
  /** Score floor for an off-inventory single code point — makes the
    * encoder total on arbitrary input without ever touching in-corpus
    * results (every training-corpus char is in-vocab by construction). */
  val UnkScoreE6: Long = -30000000L
}

/** `tokenize_counts(text)` → `array<long> [n_words, n_tokens, n_chars,
  * score_e6]` under the constructor-supplied model — the expression the
  * shipped-artifact apply queries project. Codegen ships the model as
  * a reference object (the standard Spark pattern for driver-computed
  * state inside generated Java); eval path shares the same instance. */
case class TokenizeCounts(child: Expression, model: TokenizerModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize_counts expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    model.docCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("tokModel", model,
      classOf[TokenizerModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.docCounts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
