package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.v2.GraftParquet

/** Property coverage for the parquet payload layer ([[GraftParquet]])
  * in isolation — no SparkSession: random rows must round-trip exactly
  * through write→openIterator, and footer statistics must produce zone
  * maps that BOUND every value (the soundness property segment pruning
  * rests on: a zone may be loose, never wrong). */
object GraftParquetProps extends Properties("graft-parquet") {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("ts", TimestampType)))

  // finite doubles/floats only: parquet stats order NaN unreliably, and
  // the store's cmp rejects NaN zones anyway (documents never carry it)
  private val genRow: Gen[Row] = for {
    id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    d <- Gen.option(Gen.chooseNum(-1e12, 1e12))
    f <- Gen.option(Gen.chooseNum(-1e6f, 1e6f))
    b <- Gen.option(Gen.oneOf(true, false))
    s <- Gen.option(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)),
      Gen.listOf(Gen.oneOf('√', 'é', '中', ' ', '%', '=', '/', 'a'))
        .map(_.mkString.take(20))))
    bin <- Gen.option(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray))
    // post-Gregorian-cutover only (1582-10-15 .. 9999-12-31):
    // java.sql.Timestamp speaks the HYBRID Julian/Gregorian calendar,
    // and a hybrid-only wall clock (e.g. 1300-02-29 — valid Julian,
    // nonexistent proleptic Gregorian) cannot round-trip through the
    // store's proleptic INT64 micros — the same lossy edge Spark's own
    // java.sql.Timestamp boundary has (DateTimeUtils rebase pair), not
    // a store defect; the driver's testdata is modern-epoch throughout
    ts <- Gen.option(Gen.chooseNum(-12219292800000L, 253402300799000L)
      .map(ms => new java.sql.Timestamp(ms)))
  } yield Row(id, i.orNull, d.orNull, f.orNull, b.orNull, s.orNull,
    bin.orNull, ts.orNull)

  private def writeTmp(rows: Seq[Row]): String = {
    val p = Files.createTempDirectory("gpq").resolve("t.parquet").toString
    GraftParquet.write(p, schema, rows.iterator)
    p
  }

  private def sameCell(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => x.toSeq == y.toSeq
    case (x, y) => x == y
  }

  // natural ordering on zone-map value types (mirrors the store's cmp,
  // which is package-private by design)
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(s"incomparable: $a / $b")
  }

  property("write → openIterator round-trips every supported type") =
    forAll(Gen.listOfN(60, genRow)) { rows =>
      val path = writeTmp(rows)
      val it = GraftParquet.openIterator(Seq(path), schema)
      val back = try it.toVector finally it.close()
      back.length == rows.length && rows.zip(back).forall { case (w, g) =>
        (0 until schema.length).forall(c => sameCell(w.get(c), g.get(c)))
      }
    }

  property("footer zone maps bound every non-null value (pruning soundness)") =
    forAll(Gen.listOfN(80, genRow)) { rows =>
      val path = writeTmp(rows)
      val (count, zones) = GraftParquet.footerStats(path, schema)
      count == rows.length.toLong && zones.forall { case (name, (lo, hi)) =>
        val idx = schema.fieldIndex(name)
        val vals = rows.map(_.get(idx)).filter(_ != null)
        vals.nonEmpty && vals.forall(v =>
          cmp(lo, v) <= 0 && cmp(v, hi) <= 0)
      }
    }

  property("multi-file iterator preserves order; early close is clean") =
    forAll(Gen.chooseNum(1, 40), Gen.chooseNum(1, 40)) { (na, nb) =>
      val rowsA = (0 until na).map(i => Row(i.toLong, i, null, null, null,
        s"a$i", null, null))
      val rowsB = (na until na + nb).map(i => Row(i.toLong, i, null, null,
        null, s"b$i", null, null))
      val (pa, pb) = (writeTmp(rowsA), writeTmp(rowsB))
      val it = GraftParquet.openIterator(Seq(pa, pb), schema)
      val all = try it.toVector finally it.close()
      // abandoning early must not throw on close (the LIMIT path)
      val it2 = GraftParquet.openIterator(Seq(pa, pb), schema)
      val head = it2.take(1).toVector
      it2.close()
      all.map(_.getLong(0)) == (0L until (na + nb).toLong).toVector &&
        head.size == 1
    }
}
