package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Dedup, Relational}

/** Property suite for the q01/q02 keep-first packed order
  * (Relational.packedOrdExpr): the single 62-bit long must order rows
  * EXACTLY like the lexicographic tuple (l_linenumber, l_suppkey,
  * round(l_quantity*100), round(l_extendedprice*100), l_returnflag) for
  * every row inside the documented bit-field bounds, and rows beyond
  * any bound must fail LOUDLY (raise_error) rather than silently wrap
  * into a wrong order. Written so the next driver testdata regeneration
  * that widens a column domain is a red test, not a silent reorder. */
object PackedKeepFirstProps extends Properties("packedKeepFirst") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  lazy val spark = SparkTestSession.spark

  // documented bounds: ln 1-7, suppkey<=1,048,575, qty*100<=8,191,
  // price*100<=16,777,215, flag in {A,N,R}
  private case class Li(ln: Long, supp: Long, qtyE2: Long, priceE2: Long, flag: String)

  /** Heavy boundary bias: every field independently lands AT its bound
    * often enough that a packing error at any field edge shows up. */
  private val rowGen: Gen[Li] = for {
    ln <- Gen.frequency(2 -> Gen.chooseNum(1L, 7L), 1 -> Gen.oneOf(1L, 7L))
    supp <- Gen.frequency(2 -> Gen.chooseNum(0L, 1048575L), 1 -> Gen.oneOf(0L, 1048575L))
    qty <- Gen.frequency(2 -> Gen.chooseNum(0L, 8191L), 1 -> Gen.oneOf(0L, 8191L))
    price <- Gen.frequency(2 -> Gen.chooseNum(0L, 16777215L), 1 -> Gen.oneOf(0L, 16777215L))
    flag <- Gen.oneOf("A", "N", "R")
  } yield Li(ln, supp, qty, price, flag)

  private def toDf(rows: Seq[Li]) = {
    import spark.implicits._
    rows.map(r => (1L, 1L, r.ln, r.supp, r.qtyE2 / 100.0, r.priceE2 / 100.0, r.flag))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_returnflag")
  }

  property("in-bounds: packed long order == lexicographic tuple order") =
    forAll(Gen.listOfN(120, rowGen)) { rows =>
      val ords = toDf(rows).select(Relational.packedOrdExpr.as("ord"))
        .collect().map(_.getLong(0))
      val byPacked = rows.zip(ords).sortBy(_._2).map(_._1)
      val byLex = rows.sortBy(r => (r.ln, r.supp, r.qtyE2, r.priceE2, r.flag))
      // both sorts are stable only up to equal keys; compare the KEYS in
      // order, which a correct total-order packing determines uniquely
      byPacked.map(r => (r.ln, r.supp, r.qtyE2, r.priceE2, r.flag)) ==
        byLex.map(r => (r.ln, r.supp, r.qtyE2, r.priceE2, r.flag))
    }

  property("in-bounds: packing is injective on distinct payload tuples") =
    forAll(Gen.listOfN(120, rowGen)) { rows =>
      val distinctRows = rows.distinct
      val ords = toDf(distinctRows).select(Relational.packedOrdExpr.as("ord"))
        .collect().map(_.getLong(0))
      ords.distinct.length == distinctRows.length
    }

  /** One row just BEYOND each field's bound must kill the job with the
    * packedKeepFirst raise_error message — never pack silently. */
  property("out-of-bounds: each field beyond its bound fails loudly") = {
    val beyond = Seq(
      Li(0, 0, 0, 0, "A"),                   // ln below 1
      Li(8, 0, 0, 0, "A"),                   // ln beyond 7
      Li(1, 1048576L, 0, 0, "A"),            // suppkey beyond 20 bits
      Li(1, 0, 8192L, 0, "A"),               // qty beyond 81.91
      Li(1, 0, 0, 16777216L, "A"),           // price beyond 167,772.15
      Li(1, 0, 0, 0, "X"))                   // flag outside {A,N,R}
    beyond.forall { bad =>
      val thrown =
        try { toDf(Seq(bad)).select(Relational.packedOrdExpr.as("ord")).collect(); None }
        catch { case e: Throwable => Some(e) }
      thrown.exists { e =>
        val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).toSeq
        msgs.exists(_.contains("packedKeepFirst"))
      }
    }
  }

  /** The q139/q152 packed-key guard (Dedup.guardedPacked): in-bounds
    * (doc_id, idx) pairs order lexicographically and round-trip through
    * div/mod; idx AT or past 2^bits (or a doc_id past the remaining
    * budget) raises in-plan instead of silently corrupting the order. */
  property("guardedPacked: in-bounds pairs order lexicographically and round-trip") =
    forAll(Gen.listOfN(60, for {
      doc <- Gen.chooseNum(0L, (Long.MaxValue / 65536L) - 1)
      idx <- Gen.frequency(3 -> Gen.chooseNum(0L, 65535L), 1 -> Gen.oneOf(0L, 65535L))
    } yield (doc, idx))) { pairs =>
      import spark.implicits._
      val got = pairs.toDF("doc_id", "idx")
        .select(Dedup.guardedPacked("prop", col("doc_id"), col("idx"), 16).as("p"))
        .selectExpr("p", "p div 65536 AS doc_id", "p % 65536 AS idx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val roundTrips = got.toSeq.map(t => (t._2, t._3)) == pairs
      val ordered = got.sortBy(_._1).map(t => (t._2, t._3)).toSeq == pairs.sorted
      roundTrips && ordered
    }

  property("guardedPacked: idx or doc_id past its budget raises in-plan") = {
    import spark.implicits._
    val beyond = Seq(
      (1L, 65536L),                     // idx at the 2^16 cap
      (1L, -1L),                        // negative idx
      (Long.MaxValue / 65536L, 0L),     // doc_id past the remaining budget
      (-1L, 0L))                        // negative doc_id
    beyond.forall { case (doc, idx) =>
      val thrown =
        try {
          Seq((doc, idx)).toDF("doc_id", "idx")
            .select(Dedup.guardedPacked("prop", col("doc_id"), col("idx"), 16))
            .collect(); None
        } catch { case e: Throwable => Some(e) }
      thrown.exists { e =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).exists(_.contains("packed-key"))
      }
    }
  }

  /** Regression pin for the ADVICE tie-break symmetry: a >2-decimal
    * quantity would quantize on the Spark side while DuckDB's old raw
    * ORDER BY compared doubles — both sides now order by
    * ROUND(l_quantity*100), so 10.004 and 10.001 COMPARE EQUAL in the
    * keep-first order (same quantized key) and the next field decides. */
  property("quantity ties are decided by the quantized key, not raw doubles") = {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 1L, 5L, 10.004, 100.00, "A"),
      (1L, 1L, 1L, 5L, 10.001, 100.00, "N"))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_returnflag")
    val ords = df.select(Relational.packedOrdExpr.as("ord"), col("l_returnflag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical quantized qty (1000) → flag is the deciding field → A < N
    ords.keys.toSeq.sorted.headOption.exists(ords(_) == "A") &&
      (ords.keys.max - ords.keys.min == 1L)
  }
}
