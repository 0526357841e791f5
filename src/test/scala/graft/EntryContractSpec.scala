package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the driver contract (SparkEntry): these are
  * the properties the correctness gate assumes before it runs anything. */
class EntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the family naming scheme") {
    val pat = "^(q\\d+|dd\\d+|ss\\d+|tx\\d+|mm\\d+)_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("oracle SQL never references a temp path or engine-specific syntax " +
      "that DuckDB cannot run") {
    // the oracle must read only the driver-provided tables; an absolute
    // /tmp path means a query leaked its scratch state into the oracle
    val offenders = SparkEntry.oracleSql.filter(_._2.contains("/tmp/")).keys
    assert(offenders.isEmpty, s"oracles referencing temp paths: $offenders")
  }
}
