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
