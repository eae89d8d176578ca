package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Catalog-resolved SQL functions (`graft_cat.fns.*`) — the
  * FunctionCatalog face of kernels the engine already ships as Catalyst
  * expressions/SQL helpers, so SQL users reach them WITHOUT a session
  * registration step: `SELECT graft_cat.fns.hash48(text)` works on any
  * session that has the catalog configured. Each function is
  * deterministic and engine-portable (same definitions the DuckDB
  * oracle twins use), so catalog-function results remain
  * oracle-checkable.
  *
  * Mirrors (same math, one definition point each):
  *  - hash48       ≡ [[graft.functions.Portable.sparkHash48]] (md5-prefix hash)
  *  - cosine6      ≡ `Similarity.cosineN` rounded to 6 (q24's proven scoring)
  *  - token_count  ≡ whitespace tokenization ([[graft.functions.Portable.sparkToks]]) */
object GraftFunctions {

  val Namespace: Array[String] = Array("fns")

  def names: Seq[String] = Seq("hash48", "cosine6", "token_count")

  def load(name: String): Option[UnboundFunction] = name match {
    case "hash48" => Some(Hash48)
    case "cosine6" => Some(Cosine6)
    case "token_count" => Some(TokenCount)
    case _ => None
  }

  private def require2Arrays(inputType: StructType, fname: String): Unit =
    require(inputType.length == 2 && inputType.forall(f =>
      f.dataType.isInstanceOf[ArrayType]),
      s"$fname expects (array<double>, array<double>), got $inputType")

  /** 48-bit portable hash of a string: first 12 hex digits of md5 as a
    * long — bit-identical to the engine's Portable.sparkHash48 and the
    * DuckDB twin. */
  object Hash48 extends UnboundFunction {
    override def name(): String = "hash48"
    override def description(): String = "48-bit portable md5-prefix hash of a string"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 && inputType.head.dataType == StringType,
        s"hash48 expects (string), got $inputType")
      new ScalarFunction[java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(StringType)
        override def resultType(): DataType = LongType
        override def name(): String = "hash48"
        // anonymous classes have a null getCanonicalName — a stable id
        // keeps V2 predicate translation (UserDefinedScalarFunc) safe
        override def canonicalName(): String = "graft.hash48"
        override def produceResult(input: InternalRow): java.lang.Long = {
          if (input.isNullAt(0)) return null
          val s = input.getUTF8String(0).toString
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(s.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 12)
          java.lang.Long.parseLong(hex, 16)
        }
      }
    }
  }

  /** Exact cosine similarity over two double arrays, rounded to 6
    * decimals — identical to the q24 scoring the oracle checks. */
  object Cosine6 extends UnboundFunction {
    override def name(): String = "cosine6"
    override def description(): String = "cosine similarity of two double arrays, rounded to 6 dp"
    override def bind(inputType: StructType): BoundFunction = {
      require2Arrays(inputType, "cosine6")
      new ScalarFunction[java.lang.Double] {
        override def inputTypes(): Array[DataType] =
          Array(ArrayType(DoubleType), ArrayType(DoubleType))
        override def resultType(): DataType = DoubleType
        override def name(): String = "cosine6"
        // anonymous classes have a null getCanonicalName — a stable id
        // keeps V2 predicate translation (UserDefinedScalarFunc) safe
        override def canonicalName(): String = "graft.cosine6"
        override def produceResult(input: InternalRow): java.lang.Double = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val a = input.get(0, ArrayType(DoubleType)).asInstanceOf[ArrayData]
          val b = input.get(1, ArrayType(DoubleType)).asInstanceOf[ArrayData]
          require(a.numElements() == b.numElements(),
            s"cosine6: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < a.numElements()) {
            val x = a.getDouble(i); val y = b.getDouble(i)
            dot += x * y; na += x * x; nb += y * y
            i += 1
          }
          if (na == 0.0 || nb == 0.0) return 0.0
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
  }

  /** Whitespace token count — same tokenization as the text operators:
    * split(trim(s), \s+), counting the single empty token of an
    * all-whitespace string like both engines do. */
  object TokenCount extends UnboundFunction {
    override def name(): String = "token_count"
    override def description(): String = "whitespace token count (split(trim(s), \\s+))"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 && inputType.head.dataType == StringType,
        s"token_count expects (string), got $inputType")
      new ScalarFunction[java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(StringType)
        override def resultType(): DataType = LongType
        override def name(): String = "token_count"
        // anonymous classes have a null getCanonicalName — a stable id
        // keeps V2 predicate translation (UserDefinedScalarFunc) safe
        override def canonicalName(): String = "graft.token_count"
        override def produceResult(input: InternalRow): java.lang.Long = {
          if (input.isNullAt(0)) return null
          val s = input.getUTF8String(0).toString.trim
          s.split("\\s+").length.toLong
        }
      }
    }
  }
}
