package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Similarity}

/** The bounded-eval contract behind the decontamination family's forced
  * `broadcast()` hints (Curation.decontaminate/decontaminateAgainst/
  * bloomDecontaminate, Similarity.semanticDecontam): the eval-side
  * frames are benchmark-sized in production, and the hints are only
  * correct under that contract. These tests prove the contract is now
  * ENFORCED — an oversized eval set fails LOUDLY with the named guard
  * message (never an OOM or a silent giant broadcast) — and that
  * in-bounds inputs pass through the guard row-identical (the oracle
  * hashes the driver gate checks are built on the guarded paths). */
class BoundedEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, sf).select("doc_id", "text")

  private def loudly(body: => Unit): String = {
    val e = intercept[Exception](body)
    // the guard may surface directly (the memoized driver-side check
    // throws at gate construction) or wrapped in SparkException layers;
    // the contract is that the GUARD text reaches the caller, so unwrap
    val msgs = Iterator.iterate(e.asInstanceOf[Throwable])(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("broadcast-safe bound"),
      s"expected the bounded-eval guard message, got: $msgs")
    msgs
  }

  // The consuming filter on each assertion keeps the whole gate plan
  // alive (it also exercised the r16 in-plan guard, which only rode
  // paths that materialized the broadcast); since r18 the guard is a
  // memoized driver-side count at gate CONSTRUCTION — these tests
  // drive the loud failure through that memoized path.

  test("decontaminateAgainst fails loudly past the eval bound") {
    val evalSh = Curation.evalShingleSet(docs.where("doc_id % 7 = 3"))
    loudly {
      Curation.decontaminateAgainst(docs, evalSh, maxEvalRows = 16)
        .where("contaminated").count()
    }
  }

  test("decontaminate fails loudly when the carved eval side outgrows the bound") {
    loudly {
      Curation.decontaminate(docs, maxEvalRows = 4)
        .where("contaminated").count()
    }
  }

  test("semanticDecontam fails loudly on an oversized probe/eval frame") {
    val (cents, asg) = Similarity.ivfIndexFor(spark, sf)
    loudly {
      Similarity.semanticDecontam(Tables.embeddings(spark, sf), cents, asg,
        maxEvalRows = 2).where("NOT keep").count()
    }
  }

  test("bloomDecontaminate refuses an oversized eval set") {
    val e = intercept[IllegalArgumentException] {
      Curation.bloomDecontaminate(docs.where("doc_id % 7 != 3"),
        docs.where("doc_id % 7 = 3"), maxEvalRows = 16).count()
    }
    assert(e.getMessage.contains("broadcast-safe bound"))
  }

  test("in-bounds inputs pass the guard row-identical") {
    val evalSh = Curation.evalShingleSet(docs.where("doc_id % 97 = 3"))
    val guarded = Curation.decontaminateAgainst(docs, evalSh)
    // the same gate with the guard effectively disabled — the guard
    // must be a pass-through for in-contract inputs
    val plain = Curation.decontaminateAgainst(docs, evalSh,
      maxEvalRows = Long.MaxValue)
    assert(guarded.exceptAll(plain).count() == 0 &&
      plain.exceptAll(guarded).count() == 0)
  }
}
