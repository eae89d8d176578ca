package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the documentation's query totals to the LIVE registry so they
  * cannot drift again (round-13 advice: README said 146, COVERAGE 137,
  * the registry held 154 — three different numbers for one fact). Also
  * pins the registry invariant the driver gate relies on: every
  * registered query has a DuckDB oracle twin and vice versa. */
class DocCountsSpec extends AnyFunSuite {

  private def read(path: String): String = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.mkString finally src.close()
  }

  test("every registered query has an oracle twin, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"registry/oracle drift: only-query=${q diff o}, only-oracle=${o diff q}")
  }

  test("committed SCALECHECK.json matches the live ScaleCheck section list") {
    // the artifact-freshness pin the round-14 review asked for: the
    // committed scale evidence must cover exactly the sections the
    // CURRENT build runs (keyset and order), so adding a section
    // without re-running — or committing an older run — fails here
    val json = read("SCALECHECK.json")
    val checks = """"checks"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json)
      .getOrElse(fail("SCALECHECK.json has no checks object"))
      .group(1)
    val keys = """"([a-z0-9_]+)"\s*:""".r.findAllMatchIn(checks).map(_.group(1)).toSeq
    assert(keys == ScaleCheck.sectionNames,
      s"SCALECHECK.json is stale: artifact=$keys live=${ScaleCheck.sectionNames}")
    assert(json.contains("\"ok\":true"), "committed SCALECHECK.json records a failed run")
  }

  test("README and COVERAGE query totals match the registry") {
    val n = SparkEntry.queries.size
    assert(read("README.md").contains(s"All $n registered queries"),
      s"README.md's query total is stale (registry has $n)")
    assert(read("COVERAGE.md").contains(
      s"Totals: $n registered queries, ALL $n DuckDB-oracle-backed"),
      s"COVERAGE.md's totals line is stale (registry has $n)")
  }
}
