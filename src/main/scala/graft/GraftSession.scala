package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** User-facing session helpers: canonical session config, SQL catalog
  * registration, and typed Dataset accessors for the core tables.
  *
  * `registerAll` exposes every testdata table as a temp view plus the
  * engine's custom functions, so plain `spark.sql` works against the
  * whole surface:
  * {{{
  *   GraftSession.registerAll(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
  *   spark.sql("SELECT graft_minhash_sig(array('a b','b c'))")
  * }}}
  */
object GraftSession {

  /** Canonical builder for local use — mirrors Verify/Bench config. */
  def local(cores: Int = 4): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // skew-rescue cost model — see graft.plans.SkewRescueSupport
      .config("spark.sql.adaptive.customCostEvaluatorClass",
        "graft.plans.GraftCostEvaluator")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register every table as a temp view + the custom function surface. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach { n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }
    graft.plans.MinHashSig.register(spark)
    graft.plans.CosineSim.register(spark)
    graft.plans.ShingleGen.register(spark)
    graft.plans.CharShingles.register(spark)
    graft.plans.SimHashSig.register(spark)
    graft.plans.ChunkGen.register(spark)
  }

  // Typed rows for the core tables (compile-time field checks where a
  // fixed schema is worth the ceremony; DataFrame elsewhere by design).
  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def lineitems(spark: SparkSession, sfDir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir).as[Lineitem]
  }

  def ordersDs(spark: SparkSession, sfDir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, sfDir).as[Order]
  }

  def documentsDs(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).as[Document]
  }

  def embeddingsDs(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir).as[Embedding]
  }
}
