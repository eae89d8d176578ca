package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew stress harness: measures whether `Skew.saltedJoin` actually
  * bounds the max reducer under a genuinely hot key — the scenario the
  * oracle corpus never materializes (driver testdata is uniform-ish, so
  * q104's gate proves semantics, not skew behavior).
  *
  * Method: plant a synthetic events slice where ONE event_type owns 50%
  * of all rows (in-tool generated parquet under /tmp, never driver
  * data), then run q104's exact join shape — fact ⋈ per-type totals on
  * event_type — three ways:
  *
  *   1. `plain/noAQE`  — shuffle join, AQE skew handling OFF: the
  *      pathological baseline (one reducer owns the hot key).
  *   2. `plain/AQE-*`  — AQE skew-join ON (Spark's default first-line
  *      answer), at default and tightened thresholds. Finding: for THIS
  *      plan shape AQE never splits, at any threshold —
  *      `OptimizeSkewedJoin` pattern-matches an SMJ whose Sorts wrap
  *      bare shuffle reads, and the totals side interposes the final
  *      `HashAggregate` between its Sort and its shuffle, so the rule
  *      silently does not apply. A fact ⋈ per-key-aggregate join — the
  *      single most natural skewed-join shape — is thus OUTSIDE AQE's
  *      skew handling unless the aggregate is materialized first.
  *   3. `plain-mat/AQE-tuned16m` — same join with the totals
  *      pre-materialized to parquet: the pattern now matches and AQE
  *      does split the hot partition (`aqe_skew_marked` flips true).
  *   4. `salted/noAQE` — `Skew.saltedJoin(salt=8)` with AQE skew OFF,
  *      isolating the operator's own effect: bounds the max reducer
  *      regardless of plan shape or thresholds.
  *
  * Broadcast is disabled throughout: a broadcastable build side makes
  * salting moot (no shuffle on the fact side at all), and at 100 TB the
  * interesting case is precisely the non-broadcastable one.
  *
  * Per config we capture per-task wall time and shuffle-read records via
  * a SparkListener and report, for the heaviest shuffle-read stage (the
  * join stage): max task ms, median task ms, their ratio, and the same
  * for records. The claim under test: salting takes the max/median
  * task-time ratio from O(hot-fraction × partitions) down to O(1)·salt
  * — the hot key's rows land on `salt` reducers instead of one.
  *
  * Run: java -cp <spark jars + classes> graft.tools.SkewStress [nRows]
  * Results recorded in PLANS.md (round-12 skew-stress section).
  */
object SkewStress {

  final case class TaskRec(stageId: Int, durMs: Long, shuffleRecs: Long)

  final class Capture extends SparkListener {
    val buf = new ConcurrentLinkedQueue[TaskRec]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        buf.add(TaskRec(t.stageId, t.taskInfo.duration,
          m.shuffleReadMetrics.recordsRead))
      }
    }
    def drain(): Seq[TaskRec] = {
      val out = buf.asScala.toVector
      buf.clear()
      out
    }
  }

  private def median(xs: Seq[Long]): Long =
    if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)

  /** Report on the stage with the largest total shuffle read — for this
    * query shape that is the join stage (the only heavy shuffle read). */
  private def report(label: String, wallMs: Long, recs: Seq[TaskRec]): String = {
    val byStage = recs.groupBy(_.stageId)
    val (sid, stage) = byStage.maxBy { case (_, ts) => ts.map(_.shuffleRecs).sum }
    val durs = stage.map(_.durMs)
    val srecs = stage.map(_.shuffleRecs).filter(_ > 0)
    val maxD = durs.max
    val medD = math.max(median(durs), 1L)
    val maxR = if (srecs.isEmpty) 0L else srecs.max
    val medR = math.max(median(srecs), 1L)
    f"""{"config":"$label","wall_ms":$wallMs,"join_stage":$sid,""" +
      f""""tasks":${durs.size},"max_task_ms":$maxD,"med_task_ms":$medD,""" +
      f""""task_ratio":${maxD.toDouble / medD}%.1f,""" +
      f""""max_task_shuffle_rows":$maxR,"med_task_shuffle_rows":$medR,""" +
      f""""row_ratio":${maxR.toDouble / medR}%.1f}"""
  }

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(8_000_000L)
    val path = "/tmp/skew_stress_events"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-skew-stress")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the whole point is the non-broadcastable shuffle join
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // rescue machinery available but OFF by default — each config
      // toggles spark.graft.skewJoin.rescueAggSide explicitly so the
      // legacy findings (plain/AQE-* never split) stay reproducible
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.customCostEvaluatorClass",
        "graft.plans.GraftCostEvaluator")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Planted hot key: event_type "et_hot" owns 50% of rows; the other
    // half spreads uniformly over 127 cold types. Deterministic (row id
    // parity / pmod), written to parquet so every config scans the same
    // files (also the documented determinism precondition of withSalt).
    val fact = spark.range(nRows)
      .select(
        $"id".as("event_id"),
        when(pmod($"id", lit(2)) === 0, lit("et_hot"))
          .otherwise(concat(lit("et_"), pmod($"id", lit(127)).cast("string")))
          .as("event_type"),
        pmod($"id" * 2654435761L, lit(1000000)).as("payload"))
    fact.write.mode("overwrite").parquet(path)

    val cap = new Capture
    spark.sparkContext.addSparkListener(cap)

    def totalsOf(f: DataFrame): DataFrame =
      f.groupBy("event_type").agg(count(lit(1)).as("type_total"))

    // Sum over joined rows: the probe/output work stays in the join
    // stage, the final agg is a 1-row reduction.
    def run(label: String, aqe: Boolean, skewThreshold: String = "256m",
            rescue: Boolean = false)
           (mk: () => DataFrame): String = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      spark.conf.set("spark.graft.skewJoin.rescueAggSide", rescue.toString)
      // at default thresholds (256 MB) an ~8M-row hot partition is NOT
      // skewed by AQE's definition — the tuned config shows the split
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", skewThreshold)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        if (skewThreshold == "256m") "64m" else "8m")
      cap.drain()
      val t0 = System.nanoTime()
      val joined = mk().agg(sum($"payload"))
      val n = joined.collect()(0).getLong(0)
      val wallMs = (System.nanoTime() - t0) / 1000000
      // did AQE actually mark the join skewed? (final adaptive plan)
      val planStr = joined.queryExecution.executedPlan.toString
      val skewMarked = planStr.contains("skew=true") || planStr.contains("isSkewJoin=true")
      // listener events are async; give the bus a moment to drain
      Thread.sleep(500)
      val line = report(label, wallMs, cap.drain())
        .replaceFirst("\\}$", s""","aqe_skew_marked":$skewMarked}""")
      println(s"[skew-stress] $line  checksum=$n")
      line
    }

    def freshFact() = spark.read.parquet(path)

    // warm-up: JIT + page cache, result discarded
    run("warmup", aqe = false) { () =>
      val f = freshFact(); f.join(totalsOf(f), Seq("event_type"))
    }

    val r1 = run("plain/noAQE", aqe = false) { () =>
      val f = freshFact(); f.join(totalsOf(f), Seq("event_type"))
    }
    val r2 = run("plain/AQE-default", aqe = true) { () =>
      val f = freshFact(); f.join(totalsOf(f), Seq("event_type"))
    }
    val r3 = run("plain/AQE-tuned16m", aqe = true, skewThreshold = "16m") { () =>
      val f = freshFact(); f.join(totalsOf(f), Seq("event_type"))
    }
    // Same join with the small side PRE-MATERIALIZED to parquet: now the
    // SMJ's children are bare shuffle reads, OptimizeSkewedJoin's
    // pattern matches, and the tuned thresholds actually split the hot
    // partition (aqe_skew_marked should flip to true here).
    val totalsPath = "/tmp/skew_stress_totals"
    totalsOf(freshFact()).write.mode("overwrite").parquet(totalsPath)
    val r4 = run("plain-mat/AQE-tuned16m", aqe = true, skewThreshold = "16m") { () =>
      freshFact().join(spark.read.parquet(totalsPath), Seq("event_type"))
    }
    val r5 = run("salted/noAQE", aqe = false) { () =>
      val f = freshFact(); Skew.saltedJoin(f, totalsOf(f), "event_type", salt = 8)
    }
    // Round-13 rescue: the SAME un-materialized fact ⋈ aggregate join
    // that r3 proved AQE cannot split, with SkewAggJoinRescue +
    // GraftCostEvaluator on — aqe_skew_marked must flip true with NO
    // manual rewrite (the automatic form of r4's hand-materialization).
    val r6 = run("plain-rescue/AQE-tuned16m", aqe = true,
      skewThreshold = "16m", rescue = true) { () =>
      val f = freshFact(); f.join(totalsOf(f), Seq("event_type"))
    }

    println(s"""{"n_rows":$nRows,"hot_fraction":0.5,"results":[$r1,$r2,$r3,$r4,$r5,$r6]}""")
    spark.stop()
  }
}
