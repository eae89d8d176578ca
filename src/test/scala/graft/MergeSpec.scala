package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge

/** The q108 oracle gate runs over customer/events where the key overlap
  * is data-shaped; this spec plants the three merge actions explicitly
  * and pins the MERGE cardinality rule (duplicate source keys raise).
  */
class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("update overwrites shared columns, insert nulls target-only columns, keep is verbatim") {
    val target = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "name", "bal")
    val source = Seq((2L, 99L), (3L, 77L)).toDF("k", "bal")
    val out = Merge.mergeUpsert(target, source, "k").orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, Some("a"), 10L, "keep"),
      (2L, Some("b"), 99L, "update"),   // bal from source, name kept
      (3L, None, 77L, "insert")))       // target-only name is NULL
  }

  test("source-only columns ride along and are NULL on keep rows") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val source = Seq((2L, "fresh")).toDF("k", "tag")
    val out = Merge.mergeUpsert(target, source, "k").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "a", None, "keep"),
      (2L, "b", Some("fresh"), "update")))
  }

  test("duplicate source keys raise (MERGE cardinality rule) instead of picking a winner") {
    val target = Seq((1L, "a")).toDF("k", "name")
    val source = Seq((1L, 5L), (1L, 6L)).toDF("k", "bal")
    val e = intercept[Throwable] {
      Merge.mergeUpsert(target, source, "k").collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate source key"), s"unexpected failure: $msgs")
  }

  test("scdMerge: changed key closes the old version and opens a new one; unchanged and absent keys keep; new keys insert") {
    val target = Seq(
      (1L, "a", 10L, 0L),   // will change → close + version
      (2L, "b", 20L, 5L),   // re-submitted with the SAME value → keep, no new version
      (3L, "c", 30L, 0L))   // untouched → keep
      .toDF("k", "name", "bal", "valid_from")
    val source = Seq(
      (1L, 11L, 100L),      // changed at t=100
      (2L, 20L, 100L),      // no-op change
      (4L, 44L, 200L))      // brand new key
      .toDF("k", "bal", "t")
    val out = Merge.scdMerge(target, source, "k", "bal", "t")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5), r.getString(6)))
    assert(out.toSeq == Seq(
      (1L, Some("a"), 10L, 0L, 100L, false, "close"),   // old version, now bounded
      (1L, Some("a"), 11L, 100L, -1L, true, "version"), // new open version
      (2L, Some("b"), 20L, 5L, -1L, true, "keep"),      // equal value ⇒ NO new version
      (3L, Some("c"), 30L, 0L, -1L, true, "keep"),
      (4L, None, 44L, 200L, -1L, true, "insert")))      // target-only name NULL
  }

  test("scdMerge: duplicate source keys raise (same cardinality rule as mergeUpsert)") {
    val target = Seq((1L, 10L, 0L)).toDF("k", "bal", "valid_from")
    val source = Seq((1L, 5L, 9L), (1L, 6L, 9L)).toDF("k", "bal", "t")
    val e = intercept[Throwable] {
      Merge.scdMerge(target, source, "k", "bal", "t").collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate source key"), s"unexpected failure: $msgs")
  }

  test("a key-unique source with every key matched yields zero inserts and exact row count") {
    val target = spark.range(100).selectExpr("id AS k", "id * 2 AS bal")
    val source = spark.range(50).selectExpr("id AS k", "id * 3 AS bal")
    val out = Merge.mergeUpsert(target, source, "k")
    assert(out.count() == 100)
    assert(out.where("merge_action = 'insert'").count() == 0)
    assert(out.where("merge_action = 'update'").count() == 50)
    // updated rows carry the source value
    assert(out.where("merge_action = 'update' AND bal != k * 3").count() == 0)
    assert(out.where("merge_action = 'keep' AND bal != k * 2").count() == 0)
  }
}
