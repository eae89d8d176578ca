package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-facing schema contract for the driver's testdata.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped two different physical encodings for `events.ts` (INT64
  * TIMESTAMP(NANOS), then timestamp[us]/NTZ). When that happens, twelve
  * queries and seven suites fail with confusing downstream errors; this
  * spec pins the post-loader schema of every table so a regeneration
  * breaks HERE, in one obvious place, with a message naming the table
  * and column. If it fires: update `Tables` (usually `Tables.events`) to
  * adapt the new encoding, then update the expectation below.
  */
class SchemaContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // Engine-facing (post-Tables-loader) column name → Catalyst type.
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts is TimestampType BY CONTRACT: Tables.events normalizes whatever
    // physical encoding the driver shipped (nanos-as-long / NTZ / TZ).
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  test("every table loads with the engine-facing schema the operators assume") {
    assert(expected.keySet == Tables.names.toSet, "contract covers every table")
    val problems = Tables.names.flatMap { name =>
      val got = Tables.load(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      if (got == want) Nil
      else List(s"$name:\n  expected ${want.mkString(", ")}\n  got      ${got.mkString(", ")}")
    }
    assert(problems.isEmpty,
      "testdata schema drift (driver regenerated parquet?) — adapt Tables loaders:\n" +
        problems.mkString("\n"))
  }

  test("adaptEventsTs normalizes all three shipped ts encodings to the same instants") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    // The driver has shipped TIMESTAMP(NANOS) (→ LongType under
    // nanosAsLong), then timestamp[us] NTZ; plain UTC-adjusted micros is
    // the third plausible generation. Whatever arrives, the engine-facing
    // contract is the same: TimestampType with the exact same instants.
    val micros = Seq(1700000000000000L, 1700003600123456L, 1700007200999999L)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._
    val base = micros.toDF("us")
    val encodings = Map(
      "nanos-as-long" -> base.selectExpr("us * 1000 AS ts"),
      "ntz-micros"    -> base.selectExpr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts"),
      "utc-micros"    -> base.selectExpr("timestamp_micros(us) AS ts"))
    encodings.foreach { case (label, df) =>
      val dir = Files.createTempDirectory(s"ts_enc_$label").toString + "/events"
      df.write.parquet(dir)
      val loaded = Tables.adaptEventsTs(spark.read.parquet(dir))
      assert(loaded.schema("ts").dataType == TimestampType, s"$label: wrong engine-facing type")
      val got = loaded.selectExpr("unix_micros(ts) AS us").orderBy(col("us"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == micros, s"$label: instants drifted — got $got")
    }
  }

  test("events.ts survives round-trip to an exact instant (UTC session)") {
    val ev = Tables.events(spark, sfDir)
    // A fixed aggregate over the instant values: if the loader mis-scales
    // (e.g. treats micros as nanos) the min/max year leaves [2020, 2030].
    val r = ev.selectExpr("year(min(ts)) AS lo", "year(max(ts)) AS hi").head()
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
      s"events.ts instants look mis-scaled: years ${r.getInt(0)}..${r.getInt(1)}")
  }
}
