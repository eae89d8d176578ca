package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, NoSuchViewException, TableAlreadyExistsException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 catalog plugin over [[GraftStore]] — the SQL-surface completion of
  * the connector: registered as
  * `spark.sql.catalog.graft_cat = graft.sources.v2.GraftCatalog`, it
  * makes store collections addressable as `graft_cat.<ns>.<table>` from
  * plain SQL (`CREATE TABLE` / `INSERT INTO` / `SELECT` / `UPDATE` /
  * `MERGE` / `DELETE` / `DROP TABLE`), from `df.writeTo(...)` /
  * `readStream.table(...)`, and through catalog functions
  * (`graft_cat.fns.*`, [[GraftFunctions]]) — the same way Iceberg/Delta
  * expose a lakehouse. Tables loaded through the catalog are the SAME
  * [[GraftStoreTable]] the path-based reads use, so every scan feature
  * (zone-map pruning, pushdown, columnar batches, runtime filtering,
  * storage-partitioned joins) and the two-phase write protocol apply to
  * SQL traffic unchanged.
  *
  * `PARTITIONED BY (col)` at CREATE time maps the first identity
  * transform to the store's shard key: data inserted through the
  * catalog lands range-sharded with zone maps on that column (and the
  * write declares its distribution need, see [[GraftWrite]]).
  *
  * Namespaces are implicit (a namespace "exists" iff a collection key
  * carries its prefix, plus anything created explicitly) — the store is
  * a flat keyspace, as Mongo databases are. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with ViewCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  /** `CALL graft_cat.system.<proc>(...)` — maintenance commands
    * ([[GraftProcedures]]: distributed compaction). */
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ok = ident.namespace().toSeq == GraftProcedures.namespace.toSeq
    (if (ok) GraftProcedures.load(ident.name()) else None).getOrElse(
      throw new RuntimeException(
        s"graft-store: no such procedure: ${ident.namespace().mkString(".")}.${ident.name()}"))
  }
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == GraftProcedures.namespace.toSeq)
      GraftProcedures.names.map(Identifier.of(GraftProcedures.namespace, _)).toArray
    else Array.empty

  private var catName: String = _
  // explicitly-created namespaces (CREATE NAMESPACE) — collection-derived
  // namespaces union in
  private val createdNs = scala.collection.mutable.Set.empty[Seq[String]]

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) {
      // top-level: collections whose key carries no namespace at all —
      // this is how path-API collections surface in SHOW TABLES
      GraftStore.names.filterNot(_.contains("."))
        .map(Identifier.of(Array.empty[String], _)).toArray
    } else {
      val prefix = namespace.mkString(".") + "."
      val found = GraftStore.names.collect {
        case n if n.startsWith(prefix) && !n.stripPrefix(prefix).contains(".") =>
          Identifier.of(namespace, n.stripPrefix(prefix))
      }
      if (found.isEmpty && !namespaceExists(namespace))
        throw new NoSuchNamespaceException(namespace)
      found.toArray
    }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    if (!GraftStore.exists(k)) throw new NoSuchTableException(ident)
    new GraftStoreTable(k, GraftStore.get(k).schema, 0,
      GraftStore.props(k).getOrElse("rowlevel", "delta"))
  }

  /** `SELECT ... FROM t VERSION AS OF n` — time travel over the store's
    * retained generations ([[GraftStore.getVersion]]). The snapshot
    * binds as the reserved read-only name `k@v<n>`, so the whole scan
    * stack (zone-map pruning, pushdown, columnar reads) serves the
    * historical segment vector unchanged, and any write against it
    * fails loudly in [[GraftStore]]. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val k = key(ident)
    if (!GraftStore.exists(k)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft-store: VERSION AS OF takes a numeric generation, got '$version'")
    }
    val snap = GraftStore.getVersion(k, v) // validates retention
    new GraftStoreTable(s"$k@v$v", snap.schema, 0, "delta")
  }

  /** `SELECT ... FROM t TIMESTAMP AS OF ts` — Spark hands the timestamp
    * as epoch MICROSECONDS; it resolves to the latest generation
    * installed at or before it, then binds like `VERSION AS OF`. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val k = key(ident)
    if (!GraftStore.exists(k)) throw new NoSuchTableException(ident)
    loadTable(ident, GraftStore.versionAt(k, timestampMicros).toString)
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftStore.exists(key(ident))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val k = key(ident)
    if (GraftStore.exists(k)) throw new TableAlreadyExistsException(ident)
    // tables and views share one name space (as in every SQL catalog)
    if (GraftViewRegistry.exists(ident))
      throw new TableAlreadyExistsException(ident)
    // first identity transform = shard key (range layout + zone maps)
    val shardKey = partitions.collectFirst {
      case t if t.name == "identity" && t.references().nonEmpty =>
        t.references()(0).fieldNames.mkString(".")
    }
    // TBLPROPERTIES ('payload'='disk'[, 'payload.dir'='<dir>']) makes
    // the table disk-backed from birth: payload mode is sticky, so
    // every later INSERT/UPDATE/append spills its segments to parquet
    // instead of holding rows in memory
    val props = properties.asScala.toMap
    val payloadDir = props.get("payload") match {
      case Some("disk") => Some(props.getOrElse("payload.dir",
        java.nio.file.Files.createTempDirectory("graft_store_payload").toString))
      case _ => None
    }
    GraftStore.register(k, schema, Seq.empty, shardKey, payloadDir = payloadDir)
    // persist TBLPROPERTIES (e.g. rowlevel = delta|group) with the
    // collection so loadTable sees them on every later statement
    GraftStore.setProps(k, properties.asScala.toMap)
    createdNs.synchronized { createdNs += ident.namespace().toSeq }
    new GraftStoreTable(k, schema, 0,
      GraftStore.props(k).getOrElse("rowlevel", "delta"))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-store collections are schema-immutable; recreate instead")

  override def dropTable(ident: Identifier): Boolean = {
    val k = key(ident)
    val existed = GraftStore.exists(k)
    if (existed) GraftStore.drop(k)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!GraftStore.exists(key(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (GraftStore.exists(key(newIdent))) throw new TableAlreadyExistsException(newIdent)
    GraftStore.rename(key(oldIdent), key(newIdent))
  }

  // --------------------------------------------------------- functions

  /** SQL-addressable engine kernels: `graft_cat.fns.<name>(...)` — see
    * [[GraftFunctions]]. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(GraftFunctions.Namespace))
      GraftFunctions.names.map(Identifier.of(GraftFunctions.Namespace, _)).toArray
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(GraftFunctions.Namespace))
      GraftFunctions.load(ident.name)
        .getOrElse(throw new NoSuchFunctionException(ident))
    else throw new NoSuchFunctionException(ident)

  // ------------------------------------------------------------- views

  /** `ViewCatalog` over [[GraftViewRegistry]] — SQL DDL reaches these
    * through [[GraftViewRules]] (vanilla Spark has no analyzer path to
    * a V2 view catalog; see [[GraftViews]]). Views and tables share one
    * name space: creation refuses a name the other kind already holds. */
  override def listViews(namespace: String*): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace.toArray) &&
        !GraftViewRegistry.namespaces.exists(_.startsWith(namespace.toSeq)))
      throw new NoSuchNamespaceException(namespace.toArray)
    GraftViewRegistry.list(namespace.toSeq).toArray
  }

  override def loadView(ident: Identifier): View =
    GraftViewRegistry.get(ident).map(new GraftView(ident, _))
      .getOrElse(throw new NoSuchViewException(ident))

  override def viewExists(ident: Identifier): Boolean =
    GraftViewRegistry.exists(ident)

  override def createView(info: ViewInfo): View = {
    if (tableExists(info.ident))
      throw new TableAlreadyExistsException(info.ident)
    GraftViewRegistry.put(info.ident, recOf(info), replace = false)
    createdNs.synchronized { createdNs += info.ident.namespace().toSeq }
    loadView(info.ident)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    if (tableExists(info.ident))
      throw new TableAlreadyExistsException(info.ident)
    if (!orCreate && !viewExists(info.ident))
      throw new NoSuchViewException(info.ident)
    GraftViewRegistry.put(info.ident, recOf(info), replace = true)
    createdNs.synchronized { createdNs += info.ident.namespace().toSeq }
    loadView(info.ident)
  }

  private def recOf(info: ViewInfo): GraftViewRegistry.Rec =
    GraftViewRegistry.Rec(info.sql, info.currentCatalog,
      info.currentNamespace.toSeq, info.schema,
      info.queryColumnNames.toSeq, info.columnAliases.toSeq,
      info.columnComments.toSeq, info.properties.asScala.toMap)

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    GraftViewRegistry.alter(ident, changes)
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    GraftViewRegistry.drop(ident)

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (tableExists(newIdent)) throw new ViewAlreadyExistsException(newIdent)
    GraftViewRegistry.rename(oldIdent, newIdent)
  }

  // -------------------------------------------------------- namespaces

  private def allNamespaces: Seq[Seq[String]] = {
    val derived = GraftStore.names
      .map(_.split('.').toSeq.dropRight(1)).filter(_.nonEmpty)
    val created = createdNs.synchronized(createdNs.toSeq)
    (derived ++ created ++ GraftViewRegistry.namespaces :+
      GraftFunctions.Namespace.toSeq)
      .distinct.sortBy(_.mkString("."))
  }

  override def listNamespaces(): Array[Array[String]] =
    allNamespaces.map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val p = namespace.toSeq
    val kids = allNamespaces.filter(ns => ns.length > p.length && ns.startsWith(p))
      .map(_.take(p.length + 1)).distinct
    if (kids.isEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    kids.map(_.toArray).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || allNamespaces.exists(_.startsWith(namespace.toSeq))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    createdNs.synchronized { createdNs += namespace.toSeq }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft-store namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = namespace.toSeq
    if (!namespaceExists(namespace)) return false
    // CASCADE reaches tables at ANY depth under the namespace — a.b.t
    // lives "inside" namespace a just as much as a.t does
    val tables = GraftStore.names.filter { n =>
      val ns = n.split('.').toSeq.dropRight(1)
      ns.length >= p.length && ns.startsWith(p)
    }
    if (tables.nonEmpty && !cascade) return false
    tables.foreach(GraftStore.drop)
    createdNs.synchronized {
      createdNs.filterInPlace(ns => !(ns.length >= p.length && ns.startsWith(p)))
    }
    true
  }
}
