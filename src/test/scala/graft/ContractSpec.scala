package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the correctness gate compares every entry
  * of `SparkEntry.queries` against `SparkEntry.oracleSql` — drift
  * between the two maps (a query added without its oracle, an oracle
  * orphaned by a rename) silently weakens the gate, so it fails HERE
  * first.
  */
class ContractSpec extends AnyFunSuite {

  test("every declared query has a DuckDB oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle row: ${missing.toSeq.sorted}")
  }

  test("no orphaned oracles (renamed or deleted queries)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle rows without a query: ${orphans.toSeq.sorted}")
  }

  test("query names follow the q_ convention the driver expects") {
    val bad = SparkEntry.queries.keySet.filterNot(_.startsWith("q_"))
    assert(bad.isEmpty, s"non-conventional query names: $bad")
  }
}
