package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofJoin picks the most recent right row at or before the left time") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "lp")
    val right = Seq((1L, 90L, "v1"), (1L, 150L, "v2"), (1L, 201L, "v3"), (3L, 10L, "vx"))
      .toDF("k", "t", "rp")
    val out = Temporal.asofJoin(left, right, "k", "t")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "p1", "v1"),  // 90 <= 100, not 150
      (1L, "p2", "v2"),  // 150 <= 200, not 201
      (2L, "p3", null))) // no right rows for key 2
  }

  test("asofJoin matches a simultaneous right row (<= not <)") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "lp")
    val right = Seq((1L, 100L, "v")).toDF("k", "t", "rp")
    val out = Temporal.asofJoin(left, right, "k", "t").collect()
    assert(out(0).getString(3) == "v")
  }
}
