package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Chunking, Relational}

/** Property-based suites (SURVEY.md §5.2). Each property batches its
  * generated inputs into one DataFrame so a case costs one Spark job,
  * and the case count is tuned down accordingly. */
object ChunkProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val payloadGen: Gen[Array[Byte]] = for {
    n <- Gen.frequency(
      3 -> Gen.chooseNum(0, 3000),
      1 -> Gen.oneOf(0, 1, 999, 1000, 1001, 2000, 2001)) // boundary bias at chunkSize=1000
    seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield {
    val a = new Array[Byte](n)
    new scala.util.Random(seed).nextBytes(a)
    a
  }

  property("chunk/reassemble identity") = forAll(Gen.listOfN(6, payloadGen)) { payloads =>
    import spark.implicits._
    val nonEmpty = payloads.zipWithIndex.map { case (p, i) => (s"f$i", p) }
    val df = nonEmpty.toDF("_id", "data")
    val back = Chunking.reassemble(Chunking.split(df, "_id", "data", 1000))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("data")).toMap
    nonEmpty.forall { case (id, p) =>
      if (p.isEmpty) !back.contains(id) // zero chunks -> no group
      else java.util.Arrays.equals(back(id), p)
    }
  }

  property("ReassembleBytes aggregator: many-chunk file (>=1000 chunks)") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { seed =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, udaf}
      // 1200 chunks of 64 B: would take minutes under the old O(n²)
      // Seq-append buffer; linear accumulation finishes instantly.
      val payload = new Array[Byte](1200 * 64)
      new scala.util.Random(seed).nextBytes(payload)
      val df = Seq(("big", payload)).toDF("_id", "data")
      val chunks = Chunking.split(df, "_id", "data", 64)
      val rb = udaf(new Chunking.ReassembleBytes)
      val back = chunks.groupBy("files_id")
        .agg(rb(col("n"), col("data")).as("data"))
        .collect().head.getAs[Array[Byte]]("data")
      java.util.Arrays.equals(back, payload)
    }

  property("splitLabel is a total partition into the three labels") =
    forAll(Gen.listOfN(200, Gen.chooseNum(0L, Long.MaxValue / 2654435761L))) { keys =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val labels = keys.toDF("id")
        .withColumn("split", Relational.splitLabel(col("id")))
        .collect().map(_.getString(1))
      labels.length == keys.length && labels.forall(Set("train", "validation", "test"))
    }

  property("cleanNa idempotence") = forAll(
    Gen.listOfN(30, Gen.oneOf[String](null, "", "NA", "x", "  ", "value"))) { vs =>
    import spark.implicits._
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "f")
    val once = Relational.cleanNa(df, Seq("f")).orderBy("id").collect().map(_.getString(1)).toSeq
    val twice = Relational.cleanNa(Relational.cleanNa(df, Seq("f")), Seq("f"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    once == twice && !once.contains(null) && !once.contains("")
  }
}
