package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing
import graft.sources.v2.GraftStore

/** q205's materialization claim, end to end: the schedule-ordered draw
  * frame written through the DSv2 sharded sink (shard key `pos`, so
  * [[graft.sources.v2.GraftWrite]]'s RequiresDistributionAndOrdering
  * plans the range exchange + per-writer sort) must land as range
  * segments whose concatenation — read back segment by segment, row by
  * row — IS the q182 schedule: every position exactly once, ascending,
  * (source, seq_ix) per position identical to the draw frame. Plus the
  * manifest's block arithmetic: each output shard is the contiguous
  * budget/outShards-position slice its min/max/n_draws claim. */
class ScheduleShardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("sharded DSv2 write replays the schedule segment by segment") {
    val docs = Tables.documents(spark, sf)
    val draws = Packing.scheduleDraws(docs)
    draws.write.format("graft-store").option("name", "sched_shards")
      .option("shardkey", "pos").mode("overwrite").save()
    val coll = GraftStore.get("sched_shards")
    assert(coll.shardKey.contains("pos"))
    val posIdx = coll.schema.fieldIndex("pos")
    val srcIdx = coll.schema.fieldIndex("source")
    val ixIdx = coll.schema.fieldIndex("seq_ix")
    val streams = coll.segments.map(_.rows.map(_.getLong(posIdx)))
    // within-segment ascending (the write's required ordering)
    streams.foreach(s => assert(s == s.sorted, "segment not pos-ordered"))
    // cross-segment ascending and complete: the concatenated stream is
    // positions 1..budget exactly once — disjoint contiguous ranges
    val flat = streams.flatten
    assert(flat == (1L to 10000L).toVector,
      "segment concatenation does not replay the schedule positions")
    // the replayed (pos, source, seq_ix) stream equals the draw frame
    val replayed = coll.segments.flatMap(_.rows.map(r =>
      (r.getLong(posIdx), r.getString(srcIdx), r.getLong(ixIdx))))
    val want = draws.orderBy("pos").collect().map(r =>
      (r.getAs[Long]("pos"), r.getAs[String]("source"),
        r.getAs[Long]("seq_ix"))).toVector
    assert(replayed == want, "replayed stream diverges from the schedule")
  }

  test("manifest blocks are the contiguous position slices they claim") {
    val man = Packing.scheduleShards(Tables.documents(spark, sf)).collect()
    assert(man.map(_.getAs[Long]("shard")).toSeq == (0L to 7L))
    man.foreach { r =>
      val s = r.getAs[Long]("shard")
      assert(r.getAs[Long]("n_draws") == 1250L)
      assert(r.getAs[Long]("min_pos") == s * 1250L + 1L)
      assert(r.getAs[Long]("max_pos") == (s + 1L) * 1250L)
    }
  }
}
