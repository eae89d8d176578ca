package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** q218's greedy pair packing, pinned from three sides: the histogram
  * two-pointer must equal the element-wise two-pointer on the raw
  * multiset (the batching-identical-lengths argument), the two-pointer
  * must equal the true OPTIMUM bin count for ≤2-per-bin packing (the
  * classic exchange argument, checked against exhaustive search on
  * small multisets), and the operator's per-shard bookkeeping must be
  * self-consistent (2·pairs + solos = docs, fill/waste tie out). */
class Pack2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Element-wise reference two-pointer (ascending; pair the largest
    * with the smallest that fits, else the largest rides alone). */
  private def twoPointer(lens: Seq[Long], cap: Long): (Long, Long) = {
    val a = lens.sorted
    var (lo, hi, p, s) = (0, a.size - 1, 0L, 0L)
    while (lo < hi) {
      if (a(lo) + a(hi) <= cap) { p += 1; lo += 1; hi -= 1 }
      else { s += 1; hi -= 1 }
    }
    if (lo == hi) s += 1
    (p, s)
  }

  /** True minimum bins for ≤2-per-bin packing by exhaustive pairing
    * search (exponential — tiny inputs only). */
  private def optimalBins(lens: Seq[Long], cap: Long): Long = {
    def go(rem: List[Long]): Long = rem match {
      case Nil => 0L
      case x :: rest =>
        val solo = 1L + go(rest)
        val paired = rest.zipWithIndex.collect {
          case (y, k) if x + y <= cap =>
            1L + go(rest.take(k) ++ rest.drop(k + 1))
        }
        (solo +: paired).min
    }
    go(lens.sorted.reverse.toList)
  }

  test("two-pointer greedy is optimal on exhaustively-searched multisets") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val cap = 10L
      val lens = Seq.fill(2 + rnd.nextInt(8))(1L + rnd.nextInt(10))
      val (p, s) = twoPointer(lens, cap)
      assert(p + s == optimalBins(lens, cap),
        s"greedy not optimal on $lens (trial $trial): pairs=$p solos=$s")
      assert(2 * p + s == lens.size)
    }
  }

  test("the operator's histogram fold equals the element-wise two-pointer per shard") {
    // adversarial length mix: heavy ties (histogram batching), exact
    // complements at the budget, over-budget docs (truncate → solo),
    // and a long uniform tail
    val rnd = new scala.util.Random(41)
    val texts = (0 until 400).map { i =>
      val n = rnd.nextInt(5) match {
        case 0 => 1 + rnd.nextInt(40)          // short
        case 1 => 1000 + rnd.nextInt(1100)     // near-half the budget
        case 2 => 2048                          // exactly the budget
        case 3 => 2100 + rnd.nextInt(400)      // over budget (truncates)
        case _ => 1 + rnd.nextInt(2048)        // uniform
      }
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
    val got = Packing.pack2Bins(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val byShard = texts.groupBy(_._1 % 8)
    for ((shard, docs) <- byShard) {
      val lens = docs.map { case (_, t) =>
        math.min(t.trim.split("\\s+").length.toLong, 2048L) }
      val (p, s) = twoPointer(lens, 2048L)
      val r = got(shard)
      assert(r.getLong(3) == p && r.getLong(4) == s,
        s"shard $shard: got pairs=${r.getLong(3)}/solos=${r.getLong(4)}, want $p/$s")
      assert(r.getLong(1) == lens.size && r.getLong(2) == lens.sum)
      assert(r.getLong(5) == p + s) // n_bins
      assert(r.getLong(6) == (p + s) * 2048L - lens.sum) // waste
    }
  }

  test("pack2Assign conserves docs, respects the budget, and matches the count gate bin for bin") {
    val rnd = new scala.util.Random(43)
    val texts = (0 until 300).map { i =>
      val n = rnd.nextInt(5) match {
        case 0 => 1 + rnd.nextInt(40)
        case 1 => 1000 + rnd.nextInt(1100)
        case 2 => 2048
        case 3 => 2100 + rnd.nextInt(400)
        case _ => 1 + rnd.nextInt(2048)
      }
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
    val asg = Packing.pack2Assign(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conservation: every doc exactly once
    assert(asg.map(_._3).sorted.toSeq == texts.map(_._1).sorted.toSeq)
    // bins: ≤2 members, one shard, token sum ≤ budget, id = min member
    val bins = asg.groupBy(r => (r._1, r._2))
    for (((shard, binId), members) <- bins) {
      assert(members.size <= 2, s"bin $binId in shard $shard has ${members.size} docs")
      assert(members.map(_._3).min == binId, s"bin id $binId is not the min doc id")
      assert(members.map(_._4).sum <= 2048L,
        s"bin $binId in shard $shard exceeds the budget: ${members.map(_._4).sum}")
      assert(members.forall(_._3 % 8 == shard))
      // len is the truncated whitespace count of the member
      members.foreach { case (_, _, did, len) =>
        val want = math.min(texts(did.toInt)._2.trim.split("\\s+").length.toLong, 2048L)
        assert(len == want) }
    }
    // the assignment's per-shard bin count and waste EQUAL the q218
    // histogram verdict (so the materialized pairing inherits the
    // proven optimality)
    val counts = Packing.pack2Bins(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(5), r.getLong(6))).toMap
    for ((shard, rows) <- asg.groupBy(_._1)) {
      val nBins = rows.map(_._2).distinct.size.toLong
      val waste = nBins * 2048L - rows.map(_._4).sum
      assert((nBins, waste) == counts(shard),
        s"shard $shard: assignment ($nBins bins, waste $waste) != count gate ${counts(shard)}")
    }
  }
}
