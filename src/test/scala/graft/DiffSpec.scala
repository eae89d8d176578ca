package graft

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

  test("snapshotDiff refuses mismatched schemas loudly") {
    val pre = Seq((1L, "a")).toDF("k", "v")
    val post = Seq((1L, "a")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Diff.snapshotDiff(pre, post, "k")
    }
    assert(e.getMessage.contains("schemas differ"))
  }
}
