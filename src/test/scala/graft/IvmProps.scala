package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Diff

/** Property suite for the incremental-view-maintenance algebra (q122):
  * for ANY pre/post table pair, applying the snapshot-diff change feed
  * onto the aggregated pre state must equal aggregating post directly.
  * The generator drives the edges the planted gates touch only
  * sporadically — group death, group birth, every-row-deleted feeds,
  * value updates that happen to leave the group sums unchanged,
  * negative values, and rows whose GROUP moves. */
object IvmProps extends Properties("graft-ivm") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  lazy val spark = SparkTestSession.spark

  // small key/group/value domains force collisions: updates, moves and
  // deletes hit the same groups constantly
  private val rowGen: Gen[(Long, String, Long)] = for {
    k <- Gen.chooseNum(0L, 19L)
    g <- Gen.oneOf("g0", "g1", "g2", "g3")
    v <- Gen.chooseNum(-50L, 50L)
  } yield (k, g, v)

  private def table(rows: List[(Long, String, Long)]) = {
    import spark.implicits._
    // last write per key wins so the keyed snapshot is well-formed
    rows.groupBy(_._1).map(_._2.last).toList.toDF("k", "g", "v")
  }

  property("maintain(agg(pre), diff(pre, post)) == agg(post)") =
    forAll(Gen.listOf(rowGen), Gen.listOf(rowGen)) { (preRows, postRows) =>
      val pre = table(preRows)
      val post = table(postRows)
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").cast("long").as("v"))
      val feed = Diff.snapshotDiff(pre, post, "k").select("change_type", "g", "v")
      val maintained = Diff.maintainGroupedAgg(agg(pre), feed, "g", "v")
      val direct = agg(post)
      maintained.exceptAll(direct).isEmpty && direct.exceptAll(maintained).isEmpty
    }

  // MIN/MAX is the non-self-maintainable side of the IVM boundary: the
  // same generators drive extremum deletions (forcing the recompute
  // path), duplicate extrema where only one copy is removed, group
  // birth/death, and value moves across groups — every branch of
  // maintainMinMax's maintained/dirty split.
  property("maintainMinMax(aggmm(pre), diff(pre, post), post) == aggmm(post)") =
    forAll(Gen.listOf(rowGen), Gen.listOf(rowGen)) { (preRows, postRows) =>
      val pre = table(preRows)
      val post = table(postRows)
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("g").agg(count(lit(1)).as("n"),
          min("v").as("mn"), max("v").as("mx"))
      val feed = Diff.snapshotDiff(pre, post, "k").select("change_type", "g", "v")
      val maintained = Diff.maintainMinMax(agg(pre), feed, post, "g", "v")
      val direct = agg(post)
      maintained.exceptAll(direct).isEmpty && direct.exceptAll(maintained).isEmpty
    }
}
