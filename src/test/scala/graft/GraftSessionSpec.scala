package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("registerAll exposes every table and the custom functions to SQL") {
    GraftSession.registerAll(spark, sf)
    val n = spark.sql(
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1").count()
    assert(n > 0)
    val joined = spark.sql(
      """SELECT n_name, count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""".stripMargin).count()
    assert(joined == 25)
    val sig = spark.sql("SELECT graft_minhash_sig(array('a b', 'b c')) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == graft.functions.Portable.MinhashK)
    val cos = spark.sql(
      "SELECT graft_cosine_sim(array(1D, 0D, 1D), array(1D, 0D, 1D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("custom Generator graft_shingles matches the declarative shingle path") {
    GraftSession.registerAll(spark, sf)
    // same multiset of 2-gram shingles per doc as Dedup.shingled (which
    // dedups) — compare distinct sets
    val gen = spark.sql(
      """SELECT doc_id, collect_set(shingle) AS sh FROM (
        |  SELECT doc_id, graft_shingles(text, 2) AS shingle FROM documents)
        |GROUP BY doc_id""".stripMargin)
    val decl = graft.operators.Dedup.shingled(
      Tables.documents(spark, sf)).toDF("doc_id", "sh")
    val genSorted = gen.selectExpr("doc_id", "array_sort(sh) AS sh")
    val declSorted = decl.selectExpr("doc_id", "array_sort(sh) AS sh")
    assert(genSorted.except(declSorted).count() == 0
      && declSorted.except(genSorted).count() == 0)
    // generator output feeds LATERAL-style SQL directly
    val n = spark.sql(
      "SELECT count(*) FROM (SELECT graft_shingles(text, 3) FROM documents)").collect()(0).getLong(0)
    assert(n > 0)
  }

  test("typed Dataset accessors expose compile-checked fields") {
    import spark.implicits._
    val li = GraftSession.lineitems(spark, sf)
    val qty = li.filter(_.l_quantity > 49.0).count()
    assert(qty > 0)
    val docs = GraftSession.documentsDs(spark, sf)
    assert(docs.map(_.text.length).filter(_ > 0).count() == 500)
    val emb = GraftSession.embeddingsDs(spark, sf)
    assert(emb.filter(_.embedding.length == 64).count() == emb.count())
  }
}
