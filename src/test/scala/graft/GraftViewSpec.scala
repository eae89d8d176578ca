package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftStore, GraftViewRegistry}

/** SQL views over the graft catalog ([[graft.sources.v2.GraftViews]]):
  * vanilla Spark has no analyzer path from view DDL to a V2
  * `ViewCatalog`, so the engine supplies it via an extension rule in
  * the Hints batch. These tests drive the whole surface through plain
  * `spark.sql` — CREATE/REPLACE/DROP/SHOW/ALTER/RENAME, nested views,
  * ordinal column aliases, late binding, cycle detection, write
  * rejection — and prove the zero-cost-abstraction property: a filter
  * above a view reaches the store scan's pushed filters exactly as if
  * the view SQL had been written inline. */
class GraftViewSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    s
  }

  private def freshBase(): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_cat.vwt.base")
    spark.sql("CREATE TABLE graft_cat.vwt.base (id BIGINT, grp STRING, v BIGINT) PARTITIONED BY (id)")
    spark.sql("INSERT INTO graft_cat.vwt.base VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40),(5,'c',50)")
  }

  test("CREATE VIEW + SELECT resolves through the catalog") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.big AS SELECT id, grp, v FROM graft_cat.vwt.base WHERE v >= 30")
    val got = spark.sql("SELECT id, v FROM graft_cat.vwt.big ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 30L), (4L, 40L), (5L, 50L)))
    // spark.read.table goes through the same resolution
    assert(spark.read.table("graft_cat.vwt.big").count() == 3)
  }

  test("nested views expand recursively; aggregates stay exact") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.big AS SELECT id, grp, v FROM graft_cat.vwt.base WHERE v >= 20")
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.by_grp AS SELECT grp, count(*) AS n, sum(v) AS total FROM graft_cat.vwt.big GROUP BY grp")
    val got = spark.sql("SELECT grp, n, total FROM graft_cat.vwt.by_grp ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 1L, 20L), ("b", 2L, 70L), ("c", 1L, 50L)))
  }

  test("views are late-binding: new base rows appear without re-create") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.big AS SELECT id, v FROM graft_cat.vwt.base WHERE v >= 30")
    assert(spark.sql("SELECT * FROM graft_cat.vwt.big").count() == 3)
    spark.sql("INSERT INTO graft_cat.vwt.base VALUES (6,'c',60)")
    assert(spark.sql("SELECT * FROM graft_cat.vwt.big").count() == 4)
  }

  test("ordinal column aliases rename the view's output") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.renamed (key, amount) AS SELECT id, v FROM graft_cat.vwt.base WHERE id <= 2")
    val df = spark.sql("SELECT key, amount FROM graft_cat.vwt.renamed ORDER BY key")
    assert(df.columns.toSeq == Seq("key", "amount"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // arity mismatch fails loud at CREATE time
    val e = intercept[AnalysisException] {
      spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.bad (only_one) AS SELECT id, v FROM graft_cat.vwt.base")
    }
    assert(e.getCondition != null &&
      e.getCondition.startsWith("CREATE_VIEW_COLUMN_ARITY_MISMATCH"))
  }

  test("CREATE OR REPLACE swaps the definition; plain CREATE refuses dupes") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.swap AS SELECT id FROM graft_cat.vwt.base WHERE id = 1")
    assert(spark.sql("SELECT * FROM graft_cat.vwt.swap").count() == 1)
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.swap AS SELECT id FROM graft_cat.vwt.base")
    assert(spark.sql("SELECT * FROM graft_cat.vwt.swap").count() == 5)
    intercept[AnalysisException] {
      spark.sql("CREATE VIEW graft_cat.vwt.swap AS SELECT id FROM graft_cat.vwt.base")
    }
    // IF NOT EXISTS tolerates and leaves the old definition standing
    spark.sql("CREATE VIEW IF NOT EXISTS graft_cat.vwt.swap AS SELECT id FROM graft_cat.vwt.base WHERE id = 1")
    assert(spark.sql("SELECT * FROM graft_cat.vwt.swap").count() == 5)
  }

  test("DROP VIEW removes; IF EXISTS tolerates; missing fails loud") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.doomed AS SELECT id FROM graft_cat.vwt.base")
    spark.sql("DROP VIEW graft_cat.vwt.doomed")
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM graft_cat.vwt.doomed").collect()
    }
    spark.sql("DROP VIEW IF EXISTS graft_cat.vwt.doomed")
    intercept[AnalysisException] { spark.sql("DROP VIEW graft_cat.vwt.doomed") }
  }

  test("SHOW VIEWS lists the namespace, honors LIKE patterns") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.alpha AS SELECT id FROM graft_cat.vwt.base")
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.beta AS SELECT id FROM graft_cat.vwt.base")
    val names = spark.sql("SHOW VIEWS IN graft_cat.vwt").collect()
      .map(_.getString(1)).toSet
    assert(Set("alpha", "beta").subsetOf(names))
    val filtered = spark.sql("SHOW VIEWS IN graft_cat.vwt LIKE 'alp*'")
      .collect().map(_.getString(1)).toSeq
    assert(filtered == Seq("alpha"))
  }

  test("view definition cycles fail with RECURSIVE_VIEW, not a hang") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.v2 AS SELECT id FROM graft_cat.vwt.base")
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.v1 AS SELECT id FROM graft_cat.vwt.v2")
    // rewire v2 over v1 → v1 -> v2 -> v1 cycle at next read
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.v2 AS SELECT id FROM graft_cat.vwt.v1")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT * FROM graft_cat.vwt.v1").collect()
    }
    assert(e.getCondition == "RECURSIVE_VIEW")
  }

  test("INSERT INTO a view is rejected") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.ro AS SELECT id, grp, v FROM graft_cat.vwt.base")
    val e = intercept[AnalysisException] {
      spark.sql("INSERT INTO graft_cat.vwt.ro VALUES (9,'z',90)")
    }
    assert(e.getCondition == "UNSUPPORTED_INSERT.NOT_ALLOWED")
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES and RENAME route to the catalog") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.props AS SELECT id FROM graft_cat.vwt.base")
    spark.sql("ALTER VIEW graft_cat.vwt.props SET TBLPROPERTIES ('steward'='graft','tier'='gold')")
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.v2.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("vwt"), "props")
    assert(cat.loadView(ident).properties().get("steward") == "graft")
    spark.sql("ALTER VIEW graft_cat.vwt.props UNSET TBLPROPERTIES ('tier')")
    assert(!cat.loadView(ident).properties().containsKey("tier"))
    spark.sql("ALTER VIEW graft_cat.vwt.props RENAME TO graft_cat.vwt.props2")
    assert(!cat.viewExists(ident))
    assert(spark.sql("SELECT * FROM graft_cat.vwt.props2").count() == 5)
    spark.sql("DROP VIEW graft_cat.vwt.props2")
  }

  test("views and tables share a namespace: collisions refused both ways") {
    freshBase()
    intercept[AnalysisException] {
      spark.sql("CREATE VIEW graft_cat.vwt.base AS SELECT 1 AS x")
    }
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.occupied AS SELECT 1 AS x")
    intercept[AnalysisException] {
      spark.sql("CREATE TABLE graft_cat.vwt.occupied (id BIGINT)")
    }
    spark.sql("DROP VIEW graft_cat.vwt.occupied")
  }

  test("view body resolves in the CAPTURED catalog/namespace, not the reader's") {
    freshBase()
    val cm = spark.sessionState.catalogManager
    val prevCat = cm.currentCatalog.name()
    val prevNs = cm.currentNamespace
    try {
      // create the view with vwt as the current namespace and an
      // UNQUALIFIED body reference
      spark.sql("USE graft_cat.vwt")
      spark.sql("CREATE OR REPLACE VIEW ctxv AS SELECT id, v FROM base WHERE v >= 30")
      // a decoy `base` in another namespace, then move the reader there
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.vwother")
      spark.sql("DROP TABLE IF EXISTS graft_cat.vwother.base")
      spark.sql("CREATE TABLE graft_cat.vwother.base (id BIGINT, grp STRING, v BIGINT)")
      spark.sql("INSERT INTO graft_cat.vwother.base VALUES (999,'z',999)")
      spark.sql("USE graft_cat.vwother")
      val got = spark.sql("SELECT id FROM graft_cat.vwt.ctxv ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(3L, 4L, 5L),
        "an unqualified name inside a view must bind to the CREATE-time namespace")
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
      spark.sql("DROP TABLE IF EXISTS graft_cat.vwother.base")
    }
  }

  test("view body's SUBQUERY-expression references resolve in the captured context too") {
    freshBase()
    val cm = spark.sessionState.catalogManager
    val prevCat = cm.currentCatalog.name()
    val prevNs = cm.currentNamespace
    try {
      spark.sql("USE graft_cat.vwt")
      // unqualified `base` appears ONLY inside subquery expressions —
      // plans a plain transformUp never descends into
      spark.sql("CREATE OR REPLACE VIEW subqv AS SELECT id FROM graft_cat.vwt.base " +
        "WHERE v IN (SELECT max(v) FROM base) " +
        "AND NOT EXISTS (SELECT 1 FROM base b WHERE b.id = 999)")
      // decoy: reader's namespace has a `base` with (999,'z',999); if the
      // subqueries rebind there, max(v)=999 matches nothing and the
      // EXISTS flips — either way the answer changes
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.vwother")
      spark.sql("DROP TABLE IF EXISTS graft_cat.vwother.base")
      spark.sql("CREATE TABLE graft_cat.vwother.base (id BIGINT, grp STRING, v BIGINT)")
      spark.sql("INSERT INTO graft_cat.vwother.base VALUES (999,'z',999)")
      spark.sql("USE graft_cat.vwother")
      val got = spark.sql("SELECT id FROM graft_cat.vwt.subqv").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(5L),
        "subquery-expression names inside a view must bind to the CREATE-time namespace")
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
      spark.sql("DROP TABLE IF EXISTS graft_cat.vwother.base")
    }
  }

  test("a CTE name in a sibling scope does not leave a same-named table unqualified") {
    freshBase()
    val cm = spark.sessionState.catalogManager
    val prevCat = cm.currentCatalog.name()
    val prevNs = cm.currentNamespace
    try {
      spark.sql("USE graft_cat.vwt")
      // one branch defines a CTE named `base`; the SIBLING branch
      // references the TABLE base — which must still be qualified to the
      // captured namespace (a plan-wide CTE-name exemption would leave it
      // to rebind at read time)
      spark.sql("CREATE OR REPLACE VIEW sibv AS " +
        "SELECT id FROM (WITH base AS (SELECT 100L AS id) SELECT id FROM base) x " +
        "UNION ALL SELECT id FROM base WHERE v >= 50")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.vwother")
      spark.sql("DROP TABLE IF EXISTS graft_cat.vwother.base")
      spark.sql("CREATE TABLE graft_cat.vwother.base (id BIGINT, grp STRING, v BIGINT)")
      spark.sql("INSERT INTO graft_cat.vwother.base VALUES (999,'z',999)")
      spark.sql("USE graft_cat.vwother")
      val got = spark.sql("SELECT id FROM graft_cat.vwt.sibv ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(5L, 100L),
        s"sibling-scope CTE name must not unbind the table reference (got $got)")
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
      spark.sql("DROP TABLE IF EXISTS graft_cat.vwother.base")
    }
  }

  test("a reader's CTE shadows a same-named view") {
    freshBase()
    val cm = spark.sessionState.catalogManager
    val prevCat = cm.currentCatalog.name()
    val prevNs = cm.currentNamespace
    try {
      spark.sql("USE graft_cat.vwt")
      spark.sql("CREATE OR REPLACE VIEW shadow AS SELECT id FROM graft_cat.vwt.base")
      // standard SQL: the CTE wins over any catalog object of the same
      // name — the splice rule must not expand the view here
      val got = spark.sql("WITH shadow AS (SELECT 42L AS id) SELECT id FROM shadow")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(42L), "a CTE must shadow a like-named view")
      spark.sql("DROP VIEW graft_cat.vwt.shadow")
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
    }
  }

  test("registry keys are part vectors: dotted names do not conflate") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("x", LongType)))
    def rec(sql: String) = GraftViewRegistry.Rec(sql, "graft_cat", Seq("vwt"),
      schema, Seq("x"), Seq("x"), Seq(""), Map.empty)
    // view literally named "a.b" in the ROOT namespace vs view "b" in
    // namespace "a" — distinct identities, never the same key
    val dotted = Identifier.of(Array.empty[String], "a.b")
    val nested = Identifier.of(Array("a"), "b")
    GraftViewRegistry.put(dotted, rec("SELECT 1 AS x"), replace = true)
    assert(!GraftViewRegistry.exists(nested))
    GraftViewRegistry.put(nested, rec("SELECT 2 AS x"), replace = true)
    assert(GraftViewRegistry.get(dotted).exists(_.sql == "SELECT 1 AS x"))
    assert(GraftViewRegistry.get(nested).exists(_.sql == "SELECT 2 AS x"))
    // listing attributes each to its own namespace
    assert(GraftViewRegistry.list(Seq("a")).map(_.name()) == Seq("b"))
    assert(GraftViewRegistry.list(Seq.empty).map(_.name()).contains("a.b"))
    assert(GraftViewRegistry.drop(dotted) && GraftViewRegistry.drop(nested))
  }

  test("zero-cost abstraction: a filter above a view reaches the store scan") {
    freshBase()
    spark.sql("CREATE OR REPLACE VIEW graft_cat.vwt.allrows AS SELECT id, grp, v FROM graft_cat.vwt.base")
    GraftStore.resetCounters()
    val df = spark.sql("SELECT id, v FROM graft_cat.vwt.allrows WHERE id >= 5")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L))
    // id is the shard key: the pushed range filter must have PRUNED
    // segments via zone maps — the same data skipping the inline query
    // gets. A view that blocked pushdown would read every segment.
    assert(GraftStore.segmentsSkipped.get() > 0,
      "view indirection must not defeat zone-map segment pruning")
  }
}
