package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Relational, TextAnalysis}

/** The round-17 quantile work, pinned from three sides:
  *
  *  1. `Relational.distributedNtile` (the scalable exact spelling that
  *     replaced q199/q191's corpus-window ntile) must equal the window
  *     `ntile()` TILE FOR TILE — globally, per group, under skew, and
  *     at N < n — or the rewrite would silently change oracle-gated
  *     results.
  *  2. The sampled-cutpoint siblings (q208/q209) must AGREE with the
  *     exact tiles at test SF: near-total assignment agreement, and
  *     every disagreement within one tile of the exact answer (sampled
  *     boundaries wobble; they never scramble).
  *  3. The sketch-flag gates (q210/q211) must report every
  *     within-bounds flag TRUE at test SF (the oracle pins the same as
  *     literal TRUE — this is the engine-side half of that check).
  */
class QuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def windowNtile(df: org.apache.spark.sql.DataFrame, n: Int,
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val w = (if (groupCols.isEmpty) Window.partitionBy(lit(0))
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col("v").desc, col("id"))
    df.withColumn("want", ntile(n).over(w).cast("long"))
  }

  private def assertSameTiles(df: org.apache.spark.sql.DataFrame, n: Int,
      groupCols: Seq[String]): Unit = {
    val got = Relational.distributedNtile(df, n, groupCols,
      Seq(col("v").desc, col("id")), parts = 7, tileCol = "got")
    val both = got.join(windowNtile(df, n, groupCols), Seq("id") ++ Nil)
    assert(both.where("got != want").count() == 0,
      s"distributedNtile diverged from window ntile (n=$n, groups=$groupCols)")
  }

  test("distributedNtile == window ntile: global, heavy ties, N % n != 0") {
    // 101 rows over 10 tiles (uneven), v has heavy ties so the doc-id
    // tiebreak and cross-partition boundary splitting both matter
    val df = spark.range(101).selectExpr("id", "id % 7 AS v")
    assertSameTiles(df, 10, Nil)
  }

  test("distributedNtile == window ntile: grouped, skewed group sizes") {
    // one giant group + tiny groups (one smaller than n) — the web-scale
    // shape: the dominant language IS most of the corpus
    val df = spark.range(300).selectExpr(
      "id", "CASE WHEN id < 280 THEN 'big' WHEN id < 298 THEN 'mid' ELSE 'p' END AS g",
      "(id * 13) % 11 AS v")
    val got = Relational.distributedNtile(df, 3, Seq("g"),
      Seq(col("v").desc, col("id")), parts = 5, tileCol = "got")
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("want", ntile(3).over(w).cast("long"))
    assert(got.join(want, Seq("id")).where("got != want").count() == 0)
  }

  test("distributedNtile == window ntile on the real q199 frame") {
    val scores = TextAnalysis.hashedClassifier(Tables.documents(spark, sf))
      .select("doc_id", "score_e3")
    val got = Relational.distributedNtile(scores, 10, Nil,
      Seq(col("score_e3").desc, col("doc_id")), tileCol = "got")
    val w = Window.partitionBy(lit(0)).orderBy(col("score_e3").desc, col("doc_id"))
    val want = scores.withColumn("want", ntile(10).over(w).cast("long"))
    assert(got.join(want, Seq("doc_id")).where("got != want").count() == 0)
  }

  test("sampled deciles (q208) agree with exact q199 tiles at test SF") {
    val scores = TextAnalysis.hashedClassifier(Tables.documents(spark, sf))
      .select("doc_id", "score_e3")
    val exact = Relational.distributedNtile(scores, 10, Nil,
      Seq(col("score_e3").desc, col("doc_id")), tileCol = "exact")
    val sampled = TextAnalysis.sampledTiles(scores, "score_e3", 10,
      tileCol = "sampled")
    val both = exact.select("doc_id", "exact")
      .join(sampled.select("doc_id", "sampled"), "doc_id").cache()
    val n = both.count()
    val agree = both.where("exact = sampled").count()
    // sampled boundaries wobble, they never scramble: ≥75% exact
    // agreement (10 boundaries from a ~125-doc sample at this SF —
    // measured 78.8%; grows with the sample) and 100% within one tile
    assert(agree * 4 >= n * 3, s"decile agreement $agree/$n below 75%")
    assert(both.where("abs(exact - sampled) > 1").count() == 0,
      "a sampled decile landed more than one tile from the exact one")
  }

  test("sampled terciles (q209) agree with exact q191 buckets at test SF") {
    val docs = Tables.documents(spark, sf)
    val scores = Curation.bigramScoresFor(spark, sf)
    val exact = Curation.ccnetBucketsFrom(scores, docs)
      .selectExpr("doc_id", "bucket AS exact")
    val sampled = Curation.ccnetBucketsSampled(scores, docs)
      .selectExpr("doc_id", "bucket AS sampled")
    val both = exact.join(sampled, "doc_id").cache()
    val n = both.count()
    val agree = both.where("exact = sampled").count()
    assert(agree * 10 >= n * 8, s"tercile agreement $agree/$n below 80%")
    assert(both.where("abs(exact - sampled) > 1").count() == 0)
  }

  test("the sample-state cap dials the keep rate down past the budget") {
    // a corpus whose 25% default sample would blow a small cap: 2000
    // rows against cap=60 must dial keep to (100·60) div 2000 = 3, so
    // the buffered sample is ~cap-sized, never 25% of the corpus (the
    // r17 What's-wrong #1 contract, now derived instead of documented)
    val scores = spark.range(2000).selectExpr("id AS doc_id", "id % 37 AS score_e3")
    val cap = 60L
    val keep = TextAnalysis.derivedKeepSql("__n", 100, 25, cap)
    val derived = scores.agg(count(lit(1)).as("__n"))
      .selectExpr(s"$keep AS k").head().getLong(0)
    assert(derived == 3L, s"expected the dialed keep rate 3, got $derived")
    val sampled = scores
      .where(s"${graft.functions.Portable.sparkHash48(
        "concat('qsmp_', cast(doc_id as string))")} % 100 < $derived")
      .count()
    assert(sampled <= 2 * cap,
      s"buffered sample $sampled rows is not ~cap-bounded (cap=$cap)")
    assert(sampled > 0, "the dialed rate must still draw a sample")
    // the capped path still produces a full, valid tile assignment
    val tiled = TextAnalysis.sampledTiles(scores, "score_e3", 10,
      tileCol = "tile", sampleCap = cap)
    assert(tiled.count() == 2000)
    assert(tiled.where("tile < 1 OR tile > 10").count() == 0)
    // and an UNcapped corpus (n below cap) keeps the default 25% rate —
    // the derivation only binds when the corpus outgrows the budget
    val small = scores.limit(100).agg(count(lit(1)).as("__n"))
      .selectExpr(s"$keep AS k").head().getLong(0)
    assert(small == 25L)
  }

  test("sketch gates (q210/q211) report every flag within bounds at test SF") {
    val r210 = Curation.pplMedianApprox(Curation.bigramScoresFor(spark, sf))
      .collect()
    assert(r210.length == 1)
    assert(r210.forall(r => r.getBoolean(r.fieldIndex("med_within_bounds")) &&
      r.getBoolean(r.fieldIndex("keep_within_bounds"))))
    val r211 = Curation.langMedianApprox(Tables.documents(spark, sf)).collect()
    assert(r211.nonEmpty)
    assert(r211.forall(r => r.getBoolean(r.fieldIndex("med_within_bounds")) &&
      r.getBoolean(r.fieldIndex("keep_within_bounds"))),
      "a per-lang sketch flag fell outside its bound")
  }
}
