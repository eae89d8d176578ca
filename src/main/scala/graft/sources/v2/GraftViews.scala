package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Attribute, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, InsertIntoStatement, LogicalPlan, RenameTable, SetViewProperties, ShowViews, SubqueryAlias, UnresolvedWith, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL views over the graft catalog — the seam vanilla Spark does not
  * provide: Spark 4.1 ships the `ViewCatalog` connector API
  * ([[org.apache.spark.sql.connector.catalog.ViewCatalog]]) but neither
  * the analyzer nor any exec node routes `CREATE VIEW` / view reads to
  * a V2 catalog (the session catalog is the only view store it knows).
  * So the engine supplies both halves itself, the way lakehouse
  * connectors do:
  *
  *  - [[GraftCatalog]] implements `ViewCatalog` over
  *    [[GraftViewRegistry]] (metadata-only records: view text + schema
  *    snapshot + column aliases + properties — a view is a *definition*,
  *    never materialized rows);
  *  - [[GraftViewRules]] (injected by
  *    [[graft.plans.GraftExtensions]] via `injectHintResolutionRule`,
  *    so it runs in the analyzer's Hints batch BEFORE `ResolveCatalogs`
  *    / `ResolveSessionCatalog` can reject a non-session view command)
  *    rewrites view DDL onto the catalog and splices view definitions
  *    into reads.
  *
  * Read semantics are LATE-BINDING (the stored SQL is re-parsed and
  * re-analyzed at every reference — `WITH SCHEMA EVOLUTION` in Spark's
  * vocabulary): at 100 TB a view over a store collection must follow
  * the collection's current data, not a schema frozen at CREATE time.
  * The schema recorded at creation is metadata for SHOW/DESCRIBE-style
  * introspection, not a gate. Expansion is purely a driver-side plan
  * rewrite — a view adds ZERO runtime cost over inlining its SQL, and
  * every scan-side lever (zone-map pruning, filter/column pushdown into
  * the DSv2 scan, storage-partitioned joins) applies to the spliced
  * plan exactly as it would to the hand-written query. */
object GraftViewRegistry {

  /** Immutable view definition — what `ViewCatalog.createView` persists. */
  case class Rec(
      sql: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      schema: StructType,
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String],
      properties: Map[String, String])

  // keyed by the PARTS VECTOR, never a joined string: an identifier part
  // may itself contain '.', so view `a.b` in the root namespace and view
  // `b` in namespace `a` are distinct keys
  private val views = scala.collection.mutable.Map.empty[Seq[String], Rec]

  private def key(ident: Identifier): Seq[String] =
    ident.namespace().toSeq :+ ident.name()

  def get(ident: Identifier): Option[Rec] = views.synchronized(views.get(key(ident)))
  def exists(ident: Identifier): Boolean = views.synchronized(views.contains(key(ident)))

  def put(ident: Identifier, rec: Rec, replace: Boolean): Unit = views.synchronized {
    if (!replace && views.contains(key(ident))) throw new ViewAlreadyExistsException(ident)
    views(key(ident)) = rec
  }

  def drop(ident: Identifier): Boolean =
    views.synchronized(views.remove(key(ident)).isDefined)

  def rename(from: Identifier, to: Identifier): Unit = views.synchronized {
    val rec = views.getOrElse(key(from), throw new NoSuchViewException(from))
    if (views.contains(key(to))) throw new ViewAlreadyExistsException(to)
    views -= key(from)
    views(key(to)) = rec
  }

  def alter(ident: Identifier, changes: Seq[ViewChange]): Rec = views.synchronized {
    val rec = views.getOrElse(key(ident), throw new NoSuchViewException(ident))
    val next = changes.foldLeft(rec) { (r, c) =>
      c match {
        case s: ViewChange.SetProperty =>
          r.copy(properties = r.properties + (s.property -> s.value))
        case rm: ViewChange.RemoveProperty =>
          r.copy(properties = r.properties - rm.property)
        case other =>
          throw new IllegalArgumentException(s"unsupported view change: $other")
      }
    }
    views(key(ident)) = next
    next
  }

  def list(namespace: Seq[String]): Seq[Identifier] = views.synchronized {
    views.keys.toSeq.filter(_.dropRight(1) == namespace)
      .sortBy(_.last)
      .map(parts => Identifier.of(namespace.toArray, parts.last))
  }

  def namespaces: Seq[Seq[String]] = views.synchronized {
    views.keys.toSeq.map(_.dropRight(1)).filter(_.nonEmpty).distinct
  }

  /** Test isolation hook (mirrors the store's lifecycle helpers). */
  def clear(): Unit = views.synchronized(views.clear())
}

/** Catalog-facing adapter: one registry record as Spark's `View`. */
class GraftView(ident: Identifier, rec: GraftViewRegistry.Rec) extends View {
  override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")
  override def query(): String = rec.sql
  override def currentCatalog(): String = rec.currentCatalog
  override def currentNamespace(): Array[String] = rec.currentNamespace.toArray
  override def schema(): StructType = rec.schema
  override def queryColumnNames(): Array[String] = rec.queryColumnNames.toArray
  override def columnAliases(): Array[String] = rec.columnAliases.toArray
  override def columnComments(): Array[String] = rec.columnComments.toArray
  override def properties(): java.util.Map[String, String] = rec.properties.asJava
}

/** Analyzer rules for graft views, run in the HINTS batch (which
  * precedes Resolution): by the time `ResolveSessionCatalog` — which
  * throws for any view command outside the session catalog — sees the
  * plan, every graft-view command has already been rewritten to a
  * runnable command and every graft-view read spliced away. View
  * expansion recurses eagerly with an explicit seen-set, so a
  * definition cycle fails immediately with Spark's own RECURSIVE_VIEW
  * error instead of spinning the fixed point to its iteration cap. */
case class GraftViewRules(spark: SparkSession) extends Rule[LogicalPlan] {

  private def catalogByName(name: String): Option[GraftCatalog] =
    try spark.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** Resolve a multipart name to (graft catalog, identifier) candidates
    * under SQL name-resolution rules: an explicit leading catalog name
    * wins; otherwise the CURRENT catalog + namespace qualify the name. */
  private def resolveTarget(parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    if (parts.length >= 2 && cm.isCatalogRegistered(parts.head)) {
      // an explicit catalog prefix is FINAL — a name addressed at another
      // catalog must never fall through to the current one
      catalogByName(parts.head)
        .map(g => (g, Identifier.of(parts.tail.dropRight(1).toArray, parts.last)))
    } else cm.currentCatalog match {
      case g: GraftCatalog =>
        val qualified =
          if (parts.length == 1) cm.currentNamespace.toSeq ++ parts else parts
        Some((g, Identifier.of(qualified.dropRight(1).toArray, qualified.last)))
      case _ => None
    }
  }

  private def asView(parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    resolveTarget(parts).filter { case (g, id) => g.viewExists(id) }

  /** Name normalization for CTE-shadowing checks, honoring
    * `spark.sql.caseSensitive` the way the analyzer's resolver does. */
  private def normName(s: String): String =
    if (spark.sessionState.conf.caseSensitiveAnalysis) s
    else s.toLowerCase(java.util.Locale.ROOT)

  /** CTE-scope-aware, subquery-descending relation rewrite. A plain
    * `transformUp` is wrong here twice over: it never enters plans
    * nested inside subquery EXPRESSIONS (IN / EXISTS / scalar
    * subqueries), so a table name there would escape qualification and
    * rebind to the reader's context; and collecting CTE names plan-wide
    * ignores scope — a table that merely shares a name with a CTE in a
    * sibling scope must still be qualified. This walk threads the set
    * of VISIBLE cte names: each definition sees the names defined
    * before it in its own WITH (plus enclosing scopes, plus itself when
    * the WITH allows recursion), the body sees them all, and nothing
    * leaks across sibling scopes. */
  private def rewriteRelations(plan: LogicalPlan, ctes: Set[String])(
      onRelation: (UnresolvedRelation, Set[String]) => LogicalPlan): LogicalPlan =
    plan match {
      case w: UnresolvedWith =>
        var visible = ctes
        val defs = w.cteRelations.map { case (name, alias, maxRows) =>
          val scope = if (w.allowRecursion) visible + normName(name) else visible
          val rebuilt = alias.copy(child = rewriteRelations(alias.child, scope)(onRelation))
          visible += normName(name)
          (name, rebuilt, maxRows)
        }
        val newChild = rewriteRelations(w.child, visible)(onRelation)
        val changed = (newChild ne w.child) ||
          defs.zip(w.cteRelations).exists { case (a, b) => a._2 ne b._2 }
        if (changed) w.copy(child = newChild, cteRelations = defs) else w
      case u: UnresolvedRelation => onRelation(u, ctes)
      case other =>
        other.mapChildren(rewriteRelations(_, ctes)(onRelation))
          .transformExpressionsUp {
            case se: SubqueryExpression =>
              val p = rewriteRelations(se.plan, ctes)(onRelation)
              if (p ne se.plan) se.withNewPlan(p) else se
          }
    }

  /** Splice a view definition into the plan: parse the stored SQL,
    * resolve every table name inside the body against the view's
    * CAPTURED catalog/namespace (the context recorded at CREATE time —
    * mirroring Spark's `View` node, so `USE other_ns` at read time
    * cannot rebind the body), recursively expand nested graft views
    * (cycle-checked), apply the ordinal column aliases the way
    * `FROM t AS x(a,b)` does, and wrap in a SubqueryAlias so the view
    * name survives into column qualification and EXPLAIN output. */
  private def expand(g: GraftCatalog, ident: Identifier, seen: Set[String]): LogicalPlan = {
    val fqn = (g.name +: (ident.namespace() :+ ident.name()).toSeq).mkString(".")
    if (seen.contains(fqn))
      throw new AnalysisException("RECURSIVE_VIEW",
        Map("viewIdent" -> fqn, "newPath" -> (seen + fqn).mkString(" -> ")))
    val v = g.loadView(ident)
    val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
    val cm = spark.sessionState.catalogManager
    // names a CTE in scope must stay unqualified — they are plan-local,
    // not catalog objects; the traversal threads the scoped set
    def qualify(parts: Seq[String], ctes: Set[String]): Seq[String] =
      if (parts.length >= 2 && cm.isCatalogRegistered(parts.head)) parts
      else if (parts.length == 1 && ctes.contains(normName(parts.head))) parts
      else if (parts.length == 1)
        (v.currentCatalog +: v.currentNamespace.toSeq) :+ parts.head
      else v.currentCatalog +: parts
    val expanded = rewriteRelations(parsed, Set.empty) { (u, ctes) =>
      if (u.isStreaming) u
      else {
        val q = qualify(u.multipartIdentifier, ctes)
        asView(q).map { case (g2, id2) => expand(g2, id2, seen + fqn) }
          .getOrElse(if (q == u.multipartIdentifier) u
                     else u.copy(multipartIdentifier = q))
      }
    }
    val aliased =
      if (v.columnAliases.nonEmpty && !v.columnAliases.sameElements(v.queryColumnNames))
        UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, expanded)
      else expanded
    // The analyzer's Substitution batch (CTESubstitution) runs BEFORE
    // the Hints batch this rule lives in, so a WITH inside a spliced
    // body would never be substituted and `UnresolvedWith` would
    // survive to the planner. Substitute it here, with Spark's own
    // rule — scoping, precedence policy, and recursion all behave
    // exactly as they would for inline SQL.
    CTESubstitution(SubqueryAlias(ident.name(), aliased))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // ---- DDL: rewrite view commands aimed at a graft catalog --------
    case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _, props,
        originalText, query, allowExisting, replace, _) =>
      resolveTarget(parts) match {
        case Some((g, ident)) =>
          CreateGraftViewCommand(g, ident, originalText, query,
            cols.map(_._1), cols.map(_._2.getOrElse("")),
            comment, props, allowExisting, replace)
        case None => c
      }

    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      resolveTarget(parts) match {
        case Some((g, ident)) => DropGraftViewCommand(g, ident, ifExists)
        case None => d
      }

    case s @ ShowViews(ns: UnresolvedNamespace, pattern, output) =>
      (ns.multipartIdentifier match {
        case head +: rest => catalogByName(head).map(g => (g, rest))
        case Nil => spark.sessionState.catalogManager.currentCatalog match {
          case g: GraftCatalog =>
            Some((g, spark.sessionState.catalogManager.currentNamespace.toSeq))
          case _ => None
        }
      }) match {
        case Some((g, namespace)) =>
          ShowGraftViewsCommand(g, namespace, pattern, output)
        case None => s
      }

    case s @ SetViewProperties(u: UnresolvedView, props) =>
      asView(u.multipartIdentifier) match {
        case Some((g, ident)) =>
          AlterGraftViewCommand(g, ident,
            props.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) })
        case None => s
      }

    case s @ UnsetViewProperties(u: UnresolvedView, keys, _) =>
      asView(u.multipartIdentifier) match {
        case Some((g, ident)) =>
          AlterGraftViewCommand(g, ident, keys.map(ViewChange.removeProperty))
        case None => s
      }

    case r @ RenameTable(u: UnresolvedTableOrView, newName, true) =>
      asView(u.multipartIdentifier) match {
        case Some((g, ident)) =>
          // the new name may repeat the catalog prefix (strip it), name a
          // DIFFERENT catalog (leave the plan for Spark's standard
          // cross-catalog rejection), or be bare (inherit the namespace)
          val np =
            if (newName.length >= 2 && newName.head == g.name) newName.tail
            else newName
          if (np.length >= 2 &&
              spark.sessionState.catalogManager.isCatalogRegistered(np.head)) r
          else {
            val to =
              if (np.length == 1) Identifier.of(ident.namespace(), np.head)
              else Identifier.of(np.dropRight(1).toArray, np.last)
            RenameGraftViewCommand(g, ident, to)
          }
        case None => r
      }

    // ---- reads: splice view definitions into the query tree ---------
    case other =>
      // A view is not writable — fail loud BEFORE bottom-up expansion
      // would silently turn `INSERT INTO v` into an insert against the
      // view's spliced subquery.
      other.foreach {
        case i: InsertIntoStatement => i.table match {
          case UnresolvedRelation(parts, _, _) if asView(parts).isDefined =>
            throw new AnalysisException("UNSUPPORTED_INSERT.NOT_ALLOWED",
              Map("relationId" -> parts.mkString(".")))
          case _ =>
        }
        case _ =>
      }
      rewriteRelations(other, Set.empty) { (u, ctes) =>
        val parts = u.multipartIdentifier
        if (u.isStreaming ||
            (parts.length == 1 && ctes.contains(normName(parts.head)))) u
        else asView(parts).map { case (g, id) => expand(g, id, Set.empty) }.getOrElse(u)
      }
  }
}

/** `CREATE [OR REPLACE] VIEW <graft_cat>.<ns>.<name> AS <query>`. The
  * query is analyzed HERE (not at rule-rewrite time) so its schema and
  * output names are recorded from the same session state that will
  * later expand the view. */
case class CreateGraftViewCommand(
    catalog: GraftCatalog,
    ident: Identifier,
    originalText: Option[String],
    query: LogicalPlan,
    userColumns: Seq[String],
    userColumnComments: Seq[String],
    comment: Option[String],
    properties: Map[String, String],
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val sql = originalText.getOrElse(throw new AnalysisException(
      "INTERNAL_ERROR",
      Map("message" -> s"CREATE VIEW $ident arrived without its SQL text")))
    if (catalog.tableExists(ident))
      throw new AnalysisException("TABLE_OR_VIEW_ALREADY_EXISTS",
        Map("relationName" -> ident.toString))
    if (!replace && allowExisting && catalog.viewExists(ident)) return Seq.empty
    val analyzed = spark.sessionState.executePlan(query).analyzed
    val queryNames = analyzed.schema.fieldNames.toSeq
    if (userColumns.nonEmpty && userColumns.length != queryNames.length) {
      val sub = if (userColumns.length > queryNames.length)
        "NOT_ENOUGH_DATA_COLUMNS" else "TOO_MANY_DATA_COLUMNS"
      throw new AnalysisException(s"CREATE_VIEW_COLUMN_ARITY_MISMATCH.$sub",
        Map("viewName" -> ident.toString,
          "viewColumns" -> userColumns.mkString(", "),
          "dataColumns" -> queryNames.mkString(", ")))
    }
    val aliases = if (userColumns.nonEmpty) userColumns else queryNames
    val schema = StructType(analyzed.schema.zip(aliases).map {
      case (f, a) => f.copy(name = a)
    })
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, queryNames.toArray, aliases.toArray,
      (if (userColumnComments.nonEmpty) userColumnComments
       else aliases.map(_ => "")).toArray,
      (properties ++ comment.map("comment" -> _)).asJava)
    if (replace) catalog.replaceView(info, true) else catalog.createView(info)
    Seq.empty
  }
}

case class DropGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
                                ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Seq.empty
  }
}

/** `SHOW VIEWS [IN graft_cat[.ns]]` — reuses the analyzer-provided
  * output attributes so the result schema matches Spark's session-
  * catalog SHOW VIEWS exactly (namespace, viewName, isTemporary). */
case class ShowGraftViewsCommand(catalog: GraftCatalog, namespace: Seq[String],
                                 pattern: Option[String],
                                 override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val re = pattern.map(p =>
      java.util.regex.Pattern.compile(p.replace("*", ".*"),
        java.util.regex.Pattern.CASE_INSENSITIVE))
    catalog.listViews(namespace: _*).toSeq
      .filter(id => re.forall(_.matcher(id.name()).matches()))
      .map(id => Row(id.namespace().mkString("."), id.name(), false))
  }
}

case class AlterGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
                                 changes: Seq[ViewChange]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.alterView(ident, changes: _*)
    Seq.empty
  }
}

case class RenameGraftViewCommand(catalog: GraftCatalog, from: Identifier,
                                  to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Seq.empty
  }
}
