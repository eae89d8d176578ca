package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Diff

/** Materialized views with AUTOMATIC incremental maintenance — the
  * engine feature that ties the store's MVCC time travel, the CDF
  * operator (q119), and the IVM algebra (q122 COUNT/SUM, q136 MIN/MAX)
  * into one lifecycle a user actually calls:
  *
  *   create(mv, base, ...)   — full aggregate once, record base version
  *   refresh(mv)             — bring the view up to the live base,
  *                             touching only what changed
  *   read(mv)                — serve the state through the connector
  *                             (zone maps, pushdown, SQL visibility as
  *                             `graft_cat.<mv>` — the catalog lists any
  *                             store collection)
  *
  * `refresh` picks the cheapest correct path, in order:
  *
  *  1. **noop** — base generation unchanged: zero reads.
  *  2. **append** — [[GraftStore.appendedSince]] proves the history is
  *     a pure append (old segments still a reference-equal prefix):
  *     the feed is ONLY the new segments, read distributed via their
  *     parquet paths (disk collections) — the base's old data is never
  *     rescanned. This is the 100 TB path: a day's refresh reads a
  *     day's segments.
  *  3. **diff** — something rewrote history (row-level DML, compaction,
  *     Z-order): fall back to [[Diff.snapshotDiff]] between the
  *     recorded and live versions — one full-outer join, unchanged
  *     keys dropped in-plan.
  *  4. **recompute** — the recorded version fell out of the retention
  *     ring: full re-aggregation (the only correct option left).
  *
  * The maintenance step is the gated IVM algebra unchanged:
  * [[Diff.maintainGroupedAgg]] for COUNT/SUM state,
  * [[Diff.maintainMinMax]] (dirty-group recompute, feed-bounded) for
  * MIN/MAX state.
  *
  * Two scale rules, both load-bearing at 100 TB:
  *
  *  - **Version pinning is atomic.** The refresh captures (feed
  *    segments, covered live version) in ONE store critical section
  *    ([[GraftStore.appendedSinceWithVersion]]) and reads every frame
  *    it folds at that PINNED version — an append racing the refresh
  *    is simply not covered and arrives next refresh, never folded in
  *    under an older pin (which would replay and double-count it).
  *  - **State never transits the driver past a bounded cardinality.**
  *    Views grouped by a bounded key (#langs, #sources) register
  *    through the in-memory dev path; past [[collectMaxRows]] the
  *    state is ingested DISTRIBUTED via [[GraftStore.loadDisk]]
  *    (executors write range-sharded parquet keyed by the group
  *    column, the driver reads only footers) — a view grouped by
  *    user_id or url refreshes with a bounded driver footprint
  *    (ScaleCheck `mv_refresh` pins this at 10M rows in a 512 MB
  *    heap).
  */
object GraftMatViews {

  sealed trait MvKind
  /** State (group, n, v): n = COUNT(*), v = SUM(value) as long. */
  case object SumCount extends MvKind
  /** State (group, n, mn, mx): n = COUNT(*), mn/mx = MIN/MAX(value). */
  case object MinMax extends MvKind

  /** key = the base table's unique row key (drives the diff path). */
  case class MvDef(name: String, baseTable: String, key: String,
                   group: String, value: String, kind: MvKind,
                   baseVersion: Long)

  case class RefreshResult(mode: String, feedRows: Long)

  private val registry = scala.collection.mutable.Map.empty[String, MvDef]

  def list: Seq[String] = registry.synchronized(registry.keys.toSeq.sorted)
  def definition(name: String): Option[MvDef] =
    registry.synchronized(registry.get(name))
  def drop(name: String): Unit = registry.synchronized {
    registry.remove(name)
    if (GraftStore.exists(name)) GraftStore.drop(name)
  }

  private def baseDf(spark: SparkSession, table: String, version: Option[Long]): DataFrame =
    spark.read.format("graft-store")
      .option("name", version.map(v => s"$table@v$v").getOrElse(table)).load()

  private def stateOf(df: DataFrame, group: String, value: String, kind: MvKind): DataFrame =
    kind match {
      case SumCount => df.groupBy(group)
        .agg(count(lit(1)).as("n"), sum(col(value)).cast("long").as("v"))
      case MinMax => df.groupBy(group)
        .agg(count(lit(1)).as("n"), min(col(value)).as("mn"), max(col(value)).as("mx"))
    }

  /** Driver-collect ceiling for MV state rows. Below it the state
    * registers through the in-memory dev path (a #langs-sized frame);
    * above it [[writeState]] routes through the distributed
    * [[GraftStore.loadDisk]] ingest. Overridable (tests drive the
    * distributed path with a tiny ceiling) via
    * `graft.matviews.collect.max.rows`. */
  private def collectMaxRows: Long =
    sys.props.get("graft.matviews.collect.max.rows").map(_.toLong).getOrElse(100000L)

  /** One spill root per JVM for distributed state generations; segments
    * from superseded generations are reclaimable via
    * `GraftStore.vacuum` like any disk collection's. */
  private lazy val spillDir: String =
    java.nio.file.Files.createTempDirectory("graft_mv_state").toString

  /** Persist the new state. `localCheckpoint` FIRST (eager): the state
    * plan reads the view's own previous generation through the
    * connector, so it must fully materialize (on executors — group-
    * cardinality rows, never the base) before the manifest swap below
    * replaces what it is reading. Then either a bounded driver
    * register, or — past [[collectMaxRows]] — the distributed
    * range-sharded parquet ingest keyed by the group column, where the
    * driver touches only footers. */
  private def writeState(name: String, st: DataFrame, group: String): Unit = {
    val stc = st.localCheckpoint()
    val n = stc.count()
    if (n <= collectMaxRows)
      GraftStore.register(name, stc.schema, stc.collect().toSeq)
    else
      GraftStore.loadDisk(name, stc, group,
        numSegments = math.min(64L, n / 65536L + 1L).toInt, dir = spillDir)
  }

  /** Full aggregate + version pin. The MV collection is immediately
    * SQL-visible through [[GraftCatalog]] under its collection name.
    * The aggregate reads the base AT the pinned version (not "live"),
    * so an append racing the create lands after the pin and is picked
    * up by the first refresh instead of being silently covered. */
  def create(spark: SparkSession, name: String, baseTable: String, key: String,
             group: String, value: String, kind: MvKind = SumCount): Unit = {
    val v = GraftStore.currentVersion(baseTable)
    writeState(name, stateOf(baseDf(spark, baseTable, Some(v)), group, value, kind), group)
    registry.synchronized {
      registry(name) = MvDef(name, baseTable, key, group, value, kind, v)
    }
  }

  def read(spark: SparkSession, name: String): DataFrame =
    spark.read.format("graft-store").option("name", name).load()

  /** Distributed frame over exactly these segments: parquet segments
    * read by path (never through the driver); in-memory segments — the
    * dev-connector payload — materialize driver-side by that contract. */
  private def segmentsDf(spark: SparkSession, schema: StructType,
      segs: Vector[GraftStore.Segment]): DataFrame = {
    val parquet = segs.map(_.payload).collect {
      case p: GraftStore.ParquetRows if p.constants.isEmpty => p }
    if (segs.nonEmpty && parquet.size == segs.size)
      spark.read.schema(schema).parquet(parquet.flatMap(_.paths): _*)
    else {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(segs.flatMap(_.rows).asJava, schema)
    }
  }

  /** Bring `name` up to the live base. Returns the path taken and the
    * change-feed size (0 for noop/recompute) as refresh evidence. */
  def refresh(spark: SparkSession, name: String): RefreshResult = {
    val mv = registry.synchronized(registry(name))
    // atomic capture: the feed and the version it covers come from ONE
    // store critical section, and every frame folded below is read AT
    // `cur` — an append racing this refresh is outside both and gets
    // picked up next refresh instead of replayed under an older pin
    val (appended, cur) =
      GraftStore.appendedSinceWithVersion(mv.baseTable, mv.baseVersion)
    if (cur == mv.baseVersion) return RefreshResult("noop", 0L)
    val pinnedBase = baseDf(spark, mv.baseTable, Some(cur))
    val (feedOpt, mode) = appended match {
      case Some(segs) =>
        (Some(segmentsDf(spark, pinnedBase.schema, segs)
          .select(lit("insert").as("change_type"), col(mv.group), col(mv.value))), "append")
      case None =>
        val canDiff =
          try { GraftStore.getVersion(mv.baseTable, mv.baseVersion); true }
          catch { case _: NoSuchElementException => false }
        if (canDiff)
          (Some(Diff.snapshotDiff(
              baseDf(spark, mv.baseTable, Some(mv.baseVersion)),
              pinnedBase, mv.key)
            .select(col("change_type"), col(mv.group), col(mv.value))), "diff")
        else (None, "recompute")
    }
    val (newState, feedRows, cachedOpt) = feedOpt match {
      case Some(feed) =>
        val cached = feed.cache()
        val n = cached.count()
        val st = mv.kind match {
          case SumCount => Diff.maintainGroupedAgg(
            read(spark, name), cached, mv.group, mv.value)
          case MinMax => Diff.maintainMinMax(
            read(spark, name), cached, pinnedBase, mv.group, mv.value)
        }
        (st, n, Some(cached))
      case None =>
        (stateOf(pinnedBase, mv.group, mv.value, mv.kind), 0L, None)
    }
    // writeState localCheckpoints the state (executor-resident) before
    // swapping the manifest it reads from — then the feed cache can go
    writeState(name, newState, mv.group)
    cachedOpt.foreach(_.unpersist())
    registry.synchronized { registry(name) = mv.copy(baseVersion = cur) }
    RefreshResult(mode, feedRows)
  }
}
