package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** Misra-Gries: the survival and undercount guarantees must hold under
  * ANY partitioning/merge order — that is the mergeable-summaries
  * contract the 100 TB story rests on. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // zipf-ish synthetic stream: item i appears 1000/(i+1) times
  private def stream = (0 until 40).flatMap(i => Seq.fill(1000 / (i + 1))(s"it_$i"))

  test("every true heavy hitter survives the sketch, undercounted by at most n/k") {
    for (parts <- Seq(1, 4, 16)) {
      val toks = stream.toDF("tok").repartition(parts)
      val out = HeavyHitters.heavyHitters(toks, k = 8).collect()
      assert(out.nonEmpty, s"parts=$parts")
      assert(out.forall(_.getBoolean(2)), s"parts=$parts: a heavy hitter left the sketch")
      assert(out.forall(_.getBoolean(3)), s"parts=$parts: undercount exceeded n/k")
    }
  }

  test("empty corpus yields an empty result, not an error") {
    val out = HeavyHitters.heavyHitters(
      Seq.empty[String].toDF("tok"), k = 8)
    assert(out.collect().isEmpty)
  }

  test("exact heavy set is partitioning-independent even though estimates are not") {
    val a = HeavyHitters.heavyHitters(stream.toDF("tok").repartition(2), k = 8)
      .select("tok", "cnt").collect().toSet
    val b = HeavyHitters.heavyHitters(stream.toDF("tok").repartition(13), k = 8)
      .select("tok", "cnt").collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
