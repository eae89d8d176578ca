package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.adaptive.customCostEvaluatorClass",
      "graft.plans.GraftCostEvaluator")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Count real shuffle exchanges in a (possibly AQE-finalized) plan.
    * AQE wraps materialized stages in LEAF nodes (ShuffleQueryStage,
    * ResultQueryStage), so a plain collect() sees nothing — recurse
    * through each stage's wrapped plan. Callers must run the DataFrame
    * first so the adaptive plan is final. */
  def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    df.collect()
    def go(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: QueryStageExec => go(q.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(go).sum
      case other => other.children.map(go).sum
    }
    go(org.apache.spark.sql.graft.PlanBridge.executedPlan(df))
  }

  /** Collect physical nodes through AQE wrappers (same reason as
    * [[shuffles]]: query stages hide their plans from plain collect).
    * Runs the DataFrame first so the adaptive plan is final. */
  def collectExec[T](df: org.apache.spark.sql.DataFrame)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def go(p: SparkPlan): Seq[T] = {
      val here = pf.lift(p).toSeq
      val below = p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec => go(q.plan)
        case other => other.children.flatMap(go)
      }
      here ++ below
    }
    go(org.apache.spark.sql.graft.PlanBridge.executedPlan(df))
  }
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("cleanNa maps null and empty-string (Python truthiness) but keeps values") {
    val df = Seq(
      (1L, null.asInstanceOf[String], "keep"),
      (2L, "", "also"),
      (3L, "v", null.asInstanceOf[String])
    ).toDF("id", "a", "b")
    val out = Relational.cleanNa(df, Seq("a", "b")).orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("NA", "NA", "v"))
    assert(out.map(_.getString(2)).toSeq == Seq("keep", "also", "NA"))
  }

  test("keepFirst is deterministic and keeps the minimum under the tiebreak") {
    val df = Seq(
      (1L, "b", 2), (1L, "a", 1), (1L, "c", 3),
      (2L, "x", 9)
    ).toDF("k", "v", "ord")
    val out = Relational.keepFirst(df, Seq("k"), Seq(col("ord"))).orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "a")
    assert(out(1).getString(1) == "x")
    // idempotence: dedup(dedup(x)) == dedup(x)
    val once = Relational.keepFirst(df, Seq("k"), Seq(col("ord")))
    val twice = Relational.keepFirst(once, Seq("k"), Seq(col("ord")))
    assert(once.orderBy("k", "ord").collect().toSeq == twice.orderBy("k", "ord").collect().toSeq)
  }

  test("splitLabel is a deterministic partition with ~64/16/20 proportions") {
    val df = spark.range(100000).toDF("id")
      .withColumn("split", Relational.splitLabel(col("id")))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 100000L)
    assert(math.abs(counts("train") / 100000.0 - 0.64) < 0.02)
    assert(math.abs(counts("validation") / 100000.0 - 0.16) < 0.02)
    assert(math.abs(counts("test") / 100000.0 - 0.20) < 0.02)
    // deterministic: same input -> same labels
    val again = spark.range(100000).toDF("id")
      .withColumn("split", Relational.splitLabel(col("id")))
    assert(df.except(again).count() == 0)
  }

  test("cents is exact for 2-decimal money doubles") {
    val df = Seq(0.01, 123.45, 99999.99, 0.0).toDF("x")
    val out = df.select(Relational.cents(col("x"))).as[Long].collect().toSet
    assert(out == Set(1L, 12345L, 9999999L, 0L))
  }

  test("all registered queries run at sf0.001 and every oracle key has a query") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle key $k has no query")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q90's OR-of-ANDs pushes per-table arms into both parquet scans") {
    // the Q19 optimizer test: Catalyst must extract table-local
    // conjuncts from the 3-arm disjunction and push them below the
    // join — a scan reading ALL of part/lineitem for this query would
    // be the 100 TB failure mode
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q90_tpch_q19")(spark, sf)
    val pushed = SparkTestSession.collectExec(df) { case sc: FileSourceScanExec => sc }
      .flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(f => f.contains("p_brand") && f.contains("Or")),
      s"part scan must carry the extracted brand/size disjunction, got: $pushed")
    assert(pushed.exists(f => f.contains("l_quantity")),
      s"lineitem scan must carry the quantity envelope, got: $pushed")
  }

  test("q88's max-revenue lookup joins via broadcast, not a shuffle") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = SparkEntry.queries("q88_tpch_q15")(spark, sf)
    df.collect()
    assert(SparkTestSession.collectExec(df) {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, "1-row max aggregate must broadcast back to the revenue frame")
  }

  test("sketches stay within error bounds of the exact answers") {
    // q47 now carries its own bound verdicts (hash-checked against the
    // oracle's literal TRUE); the spec asserts the flags and the exact
    // columns against an independent computation
    val rows = SparkEntry.queries("q47_sketches")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)} HLL out of bounds")
      assert(r.getBoolean(5), s"${r.getString(0)} quantile out of bounds")
    }
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
           expr("percentile(cast(round(l_extendedprice * 100) as bigint), 0.5) * 2").as("m2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), math.round(r.getDouble(2)))).toMap
    rows.foreach { r =>
      val (d, m2) = exact(r.getString(0))
      assert(r.getLong(1) == d && r.getLong(2) == m2)
    }
  }
}
