package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Diff

/** The q119 oracle gate proves snapshotDiff over the store's real
  * time-travel generations; this spec plants the semantic corners the
  * mutation predicates can't reach: NULL payload transitions and the
  * unchanged-row fast exit. */
class DiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshotDiff emits the four CDC row kinds and drops unchanged keys") {
    val pre = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")))
      .toDF("k", "v")
    val post = Seq((2L, Some("b")), (3L, Some("C")), (4L, Some("d")))
      .toDF("k", "v")
    val out = Diff.snapshotDiff(pre, post, "k")
      .orderBy("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, "delete", "a"),
      (3L, "update_post", "C"),  // 'post' < 'pre' alphabetically
      (3L, "update_pre", "c"),
      (4L, "insert", "d")))   // key 2 (unchanged) emits nothing
  }

  test("snapshotDiff sees NULL transitions as updates (null-safe compare)") {
    val pre = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val post = Seq((1L, Some("now")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "v")
    val out = Diff.snapshotDiff(pre, post, "k")
      .orderBy("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq == Seq(
      (1L, "update_post", Some("now")), (1L, "update_pre", None),
      (2L, "update_post", None), (2L, "update_pre", Some("x"))))
    // key 3: NULL <=> NULL is TRUE — unchanged, no row
  }

  test("maintainGroupedAgg handles group moves, group birth, and group death") {
    // old state: g1 = {(1,10),(2,20)}, g2 = {(3,30)}
    val base = Seq(("g1", 2L, 30L), ("g2", 1L, 30L)).toDF("g", "n", "v")
    val changes = Seq(
      // row 3 MOVES g2 → g3: debit g2, credit g3 (birth)
      ("update_pre", "g2", 30L), ("update_post", "g3", 31L),
      // row 1 deleted; row 2 value-updated in place
      ("delete", "g1", 10L),
      ("update_pre", "g1", 20L), ("update_post", "g1", 25L),
      // new row in g1
      ("insert", "g1", 5L))
      .toDF("change_type", "g", "v")
    val out = Diff.maintainGroupedAgg(base, changes, "g", "v")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("g1", 2L, 30L),   // -row1(10) -20+25 +5 on n: 2-1-1+1+1=2; v: 30-10-20+25+5=30
      ("g3", 1L, 31L)))  // g2 died (count 0 → dropped), g3 born
  }

  test("maintainGroupedAgg over a snapshotDiff feed equals direct re-aggregation") {
    val pre = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("k", "g", "x")
    val post = Seq((2L, "a", 21L), (3L, "c", 30L), (4L, "b", 40L), (5L, "b", 50L))
      .toDF("k", "g", "x")
    val base = pre.groupBy("g").agg(count(lit(1)).as("n"), sum("x").cast("long").as("v"))
    val feed = Diff.snapshotDiff(pre, post, "k").select("change_type", "g", "x")
    val maintained = Diff.maintainGroupedAgg(base, feed, "g", "x")
    val direct = post.groupBy("g").agg(count(lit(1)).as("n"), sum("x").cast("long").as("v"))
    assert(maintained.exceptAll(direct).count() == 0 &&
           direct.exceptAll(maintained).count() == 0)
  }

  test("maintainGroupedAgg fails loudly on an unknown or NULL change_type") {
    val base = Seq(("g1", 1L, 10L)).toDF("g", "n", "v")
    // the common single-row CDC "update" convention must be rejected,
    // not silently treated as a delete
    val bad = Seq(("update", "g1", 11L)).toDF("change_type", "g", "v")
    val e = intercept[Exception] {
      Diff.maintainGroupedAgg(base, bad, "g", "v").collect()
    }
    assert(e.getMessage.contains("unknown change_type") ||
      e.getCause != null && e.getCause.getMessage.contains("unknown change_type"))
  }

  test("maintainMinMax never touches the base table on the maintained path") {
    // state: g1 min=10 max=30; the feed deletes a NON-extremum (20) and
    // inserts 5 (new min) and 40 (new max) — maintainable without the
    // base table, proven by handing it an EMPTY post frame: any read of
    // it would produce a wrong (empty-group) answer or fail.
    val base = Seq(("g1", 3L, 10L, 30L)).toDF("g", "n", "mn", "mx")
    val feed = Seq(
      ("delete", "g1", 20L), ("insert", "g1", 5L), ("insert", "g1", 40L))
      .toDF("change_type", "g", "v")
    val emptyPost = Seq.empty[(Long, String, Long)].toDF("k", "g", "v")
    val out = Diff.maintainMinMax(base, feed, emptyPost, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("g1", 4L, 5L, 40L)))
  }

  test("maintainMinMax recomputes exactly the dirty groups from the post image") {
    // g1: its MAX (30) is deleted → dirty → recomputed from post
    // (surviving values 10, 12 — 12 is unknowable from the state).
    // g2: insert-only → maintained; a recompute would also return it,
    // so pin the plan too: only ONE group may reach the semi join.
    val base = Seq(("g1", 2L, 10L, 30L), ("g2", 1L, 7L, 7L)).toDF("g", "n", "mn", "mx")
    val post = Seq((1L, "g1", 10L), (5L, "g1", 12L), (3L, "g2", 7L), (6L, "g2", 99L))
      .toDF("k", "g", "v")
    val feed = Seq(
      ("delete", "g1", 30L), ("insert", "g1", 12L), ("insert", "g2", 99L))
      .toDF("change_type", "g", "v")
    val out = Diff.maintainMinMax(base, feed, post, "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("g1", 2L, 10L, 12L), ("g2", 2L, 7L, 99L)))
  }

  test("maintainMinMax handles the duplicate-extremum deletion (one copy removed)") {
    // two rows tie at max=30; deleting ONE copy still dirties the group
    // (the state alone cannot know a twin survives) and the recompute
    // returns max=30 again — exactness over guesswork.
    val base = Seq(("g1", 3L, 10L, 30L)).toDF("g", "n", "mn", "mx")
    val post = Seq((1L, "g1", 10L), (2L, "g1", 30L)).toDF("k", "g", "v")
    val feed = Seq(("delete", "g1", 30L)).toDF("change_type", "g", "v")
    val out = Diff.maintainMinMax(base, feed, post, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("g1", 2L, 10L, 30L)))
  }

  test("maintainMinMax: NULL values never dirty a group (NULL extrema, NULL removals)") {
    // group g1 holds only NULL values (mn = mx = NULL); an insert-only
    // feed must ride the MAINTAINED path — a bare NULL <=> NULL dirty
    // test would recompute g1 from the (here deliberately EMPTY) post
    // frame and drop the group. A delete of a NULL value likewise
    // cannot dislodge an extremum.
    val base = Seq(("g1", 2L, Option.empty[Long], Option.empty[Long]),
      ("g2", 2L, Some(4L), Some(9L))).toDF("g", "n", "mn", "mx")
    val feed = Seq(
      ("insert", "g1", Option.empty[Long]),
      ("delete", "g2", Option.empty[Long])) // NULL removal: not dirty
      .toDF("change_type", "g", "v")
    val emptyPost = Seq.empty[(Long, String, Option[Long])].toDF("k", "g", "v")
    val out = Diff.maintainMinMax(base, feed, emptyPost, "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      ("g1", 3L, None, None),
      ("g2", 1L, Some(4L), Some(9L))))
  }

  test("maintainMinMax fails loudly on an unknown change_type") {
    val base = Seq(("g1", 1L, 10L, 10L)).toDF("g", "n", "mn", "mx")
    val bad = Seq(("upsert", "g1", 11L)).toDF("change_type", "g", "v")
    val post = Seq((1L, "g1", 10L)).toDF("k", "g", "v")
    val e = intercept[Exception] {
      Diff.maintainMinMax(base, bad, post, "g", "v").collect()
    }
    assert(e.getMessage.contains("unknown change_type") ||
      e.getCause != null && e.getCause.getMessage.contains("unknown change_type"))
  }

  test("snapshotDiff refuses mismatched schemas loudly") {
    val pre = Seq((1L, "a")).toDF("k", "v")
    val post = Seq((1L, "a")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Diff.snapshotDiff(pre, post, "k")
    }
    assert(e.getMessage.contains("schemas differ"))
  }
}
