package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** Maintenance procedures for the `graft_cat` catalog — the SQL `CALL`
  * surface (Spark 4 ProcedureCatalog) for operations that are commands
  * on the STORE rather than queries over a table:
  *
  *   CALL graft_cat.system.compact(tbl => 'lake.t', segments => 8)
  *
  * `compact` runs [[GraftStore.compact]]: a distributed re-ingest of a
  * fragmented collection through its own connector scan (the remedy
  * for tail segments accumulated by per-epoch appends) and returns one
  * row of evidence — segment counts before/after and the resulting
  * row count. */
object GraftProcedures {

  val namespace: Array[String] = Array("system")

  def load(name: String): Option[UnboundProcedure] = name match {
    case "compact" => Some(CompactProcedure)
    case "history" => Some(HistoryProcedure)
    case "vacuum" => Some(VacuumProcedure)
    case "zorder" => Some(ZorderProcedure)
    case "detail" => Some(DetailProcedure)
    case _ => None
  }
  def names: Seq[String] = Seq("compact", "detail", "history", "vacuum", "zorder")

  /** `CALL graft_cat.system.history(tbl => 't')` — the retained
    * time-travel generations (the `DESCRIBE HISTORY` analog): one row
    * per version with its install instant, row count, and segment
    * count; `VERSION AS OF` takes the `version` column verbatim. */
  private object HistoryProcedure extends UnboundProcedure {
    override def name(): String = "history"
    override def description(): String =
      "retained time-travel versions of a graft-store collection"
    override def bind(inputType: StructType): BoundProcedure = HistoryBound
  }

  private object HistoryBound extends BoundProcedure {
    override def name(): String = "history"
    override def description(): String = HistoryProcedure.description()
    override def isDeterministic: Boolean = false // reads mutable state

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("tbl", StringType)
        .comment("collection name as the catalog sees it").build())

    private val outSchema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("installed_at", TimestampType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("segments", IntegerType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val tbl = input.getUTF8String(0).toString
      val out = GraftStore.versionHistory(tbl).map { case (gen, ts, rows, segs) =>
        new GenericInternalRow(Array[Any](gen, ts, rows, segs)): InternalRow
      }.toArray
      util.Collections.singletonList(new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft-store history($tbl)"
      }: Scan).iterator()
    }
  }

  private object CompactProcedure extends UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "distributed compaction of a graft-store collection's segment layout"
    override def bind(inputType: StructType): BoundProcedure = Bound
  }

  private object Bound extends BoundProcedure {
    override def name(): String = "compact"
    override def description(): String = CompactProcedure.description()
    override def isDeterministic: Boolean = false // mutates the store

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("tbl", StringType)
        .comment("collection name as the catalog sees it, e.g. lake.t").build(),
      ProcedureParameter.in("segments", IntegerType)
        .defaultValue("-1")
        .comment("target segment count; -1 = min(current, 8)").build())

    private val outSchema = StructType(Seq(
      StructField("segments_before", IntegerType, nullable = false),
      StructField("segments_after", IntegerType, nullable = false),
      StructField("row_count", LongType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val tbl = input.getUTF8String(0).toString
      val target = input.getInt(1)
      val spark = SparkSession.active
      val (before, after) = GraftStore.compact(tbl, spark, target)
      val row = new GenericInternalRow(Array[Any](
        before, after, GraftStore.get(tbl).rowCount))
      util.Collections.singletonList(new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft-store compact($tbl)"
      }: Scan).iterator()
    }
  }

  /** `CALL graft_cat.system.detail(tbl => 't')` — one row per segment:
    * rows, payload kind, file count and bytes on disk, the zone-map
    * span of every mapped column, and which columns carry Bloom
    * filters (the `DESCRIBE DETAIL` analog, at segment granularity —
    * the evidence surface for "is my layout actually prunable?"). */
  private object DetailProcedure extends UnboundProcedure {
    override def name(): String = "detail"
    override def description(): String =
      "per-segment layout detail of a graft-store collection"
    override def bind(inputType: StructType): BoundProcedure = DetailBound
  }

  private object DetailBound extends BoundProcedure {
    override def name(): String = "detail"
    override def description(): String = DetailProcedure.description()
    override def isDeterministic: Boolean = false // reads mutable state

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("tbl", StringType)
        .comment("collection name as the catalog sees it").build())

    private val outSchema = StructType(Seq(
      StructField("segment", IntegerType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("payload", StringType, nullable = false),
      StructField("files", IntegerType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("manifest_bytes", LongType, nullable = false),
      StructField("zones", StringType, nullable = false),
      StructField("blooms", StringType, nullable = false)))

    private def utf8(s: String) =
      org.apache.spark.unsafe.types.UTF8String.fromString(s)

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val tbl = input.getUTF8String(0).toString
      val coll = GraftStore.get(tbl)
      val out = coll.segments.zipWithIndex.map { case (seg, i) =>
        val (kind, files, bytes) = seg.payload match {
          case GraftStore.ParquetRows(paths, _, _, _) =>
            val bs = paths.map { p =>
              val f = if (p.startsWith("file:"))
                new java.io.File(java.net.URI.create(p).getPath)
              else new java.io.File(p)
              f.length()
            }.sum
            ("parquet", paths.size, bs)
          case _ => ("memory", 0, 0L)
        }
        val zones = seg.zones.toSeq.sortBy(_._1)
          .map { case (c, (lo, hi)) => s"$c:[$lo..$hi]" }.mkString(", ")
        val blooms = seg.blooms.keys.toSeq.sorted.mkString(", ")
        new GenericInternalRow(Array[Any](
          i, seg.count, utf8(kind), files, bytes, seg.manifestBytes,
          utf8(zones), utf8(blooms))
        ): InternalRow
      }.toArray
      util.Collections.singletonList(new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft-store detail($tbl)"
      }: Scan).iterator()
    }
  }

  /** `CALL graft_cat.system.vacuum(tbl => 't', keep_last => 1)` —
    * expire time-travel generations beyond the last `keep_last` and
    * delete disk payload files no longer referenced by any live
    * collection or retained version (the `VACUUM` analog). Returns the
    * reclamation evidence: versions expired, files deleted, bytes
    * reclaimed, versions still retained. */
  private object VacuumProcedure extends UnboundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "expire time-travel history and reclaim unreferenced disk payload files"
    override def bind(inputType: StructType): BoundProcedure = VacuumBound
  }

  private object VacuumBound extends BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String = VacuumProcedure.description()
    override def isDeterministic: Boolean = false // mutates the store

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("tbl", StringType)
        .comment("collection name as the catalog sees it").build(),
      ProcedureParameter.in("keep_last", IntegerType)
        .defaultValue("1")
        .comment("retained generations after the vacuum (>= 1)").build())

    private val outSchema = StructType(Seq(
      StructField("expired_versions", IntegerType, nullable = false),
      StructField("deleted_files", IntegerType, nullable = false),
      StructField("reclaimed_bytes", LongType, nullable = false),
      StructField("retained_versions", IntegerType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val tbl = input.getUTF8String(0).toString
      val keep = input.getInt(1)
      val (expired, files, bytes) = GraftStore.vacuum(tbl, keep)
      val row = new GenericInternalRow(Array[Any](
        expired, files, bytes, GraftStore.versionHistory(tbl).size))
      util.Collections.singletonList(new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft-store vacuum($tbl)"
      }: Scan).iterator()
    }
  }

  /** `CALL graft_cat.system.zorder(tbl => 't', x => 'a', y => 'b')` —
    * distributed 2-D re-clustering on the Morton code of two numeric
    * columns, so zone maps prune on predicates over EITHER dimension
    * (the `OPTIMIZE ... ZORDER BY` analog). */
  private object ZorderProcedure extends UnboundProcedure {
    override def name(): String = "zorder"
    override def description(): String =
      "re-cluster a collection on the Morton code of two numeric columns"
    override def bind(inputType: StructType): BoundProcedure = ZorderBound
  }

  private object ZorderBound extends BoundProcedure {
    override def name(): String = "zorder"
    override def description(): String = ZorderProcedure.description()
    override def isDeterministic: Boolean = false // mutates the store

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("tbl", StringType)
        .comment("collection name as the catalog sees it").build(),
      ProcedureParameter.in("x", StringType)
        .comment("first z-order dimension (numeric column)").build(),
      ProcedureParameter.in("y", StringType)
        .comment("second z-order dimension (numeric column)").build(),
      ProcedureParameter.in("segments", IntegerType)
        .defaultValue("-1")
        .comment("target segment count; -1 = keep current").build())

    private val outSchema = StructType(Seq(
      StructField("segments_before", IntegerType, nullable = false),
      StructField("segments_after", IntegerType, nullable = false),
      StructField("row_count", LongType, nullable = false)))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val tbl = input.getUTF8String(0).toString
      val (x, y) = (input.getUTF8String(1).toString, input.getUTF8String(2).toString)
      val target = input.getInt(3)
      val (before, after) = GraftStore.zorder(tbl, SparkSession.active, x, y, target)
      val row = new GenericInternalRow(Array[Any](
        before, after, GraftStore.get(tbl).rowCount))
      util.Collections.singletonList(new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft-store zorder($tbl)"
      }: Scan).iterator()
    }
  }
}
