package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke + shape checks at sf0.001; value-level parity with DuckDB is
  * covered by the driver gate (and scripts/check.py locally).
  */
class CoreQueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Pair-discovery queries can be LEGITIMATELY empty at the 50-doc
    * smoke SF (no two payloads are near-identical there); their
    * non-empty behavior is pinned at sf0.01 by the oracle gate and by
    * operator specs with crafted duplicates.
    */
  private val emptyOkAtSmokeSf = Set("q_media_neardup")

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0 || emptyOkAtSmokeSf(name), s"$name returned no rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("pivot and multijoin forms agree") {
    val a = SparkEntry.queries("q_multijoin")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_pivot")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
