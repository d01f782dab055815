package graft.queries

import graft.SparkSpec

/** SQL-first parity: every [[SqlQueries]] text, run as pure
  * `spark.sql` against the `graft.data.*` catalog tables, returns
  * row-for-row the same result as the declared DataFrame query —
  * the contract that a SQL-only user of the engine is a first-class
  * citizen. Also pins that the catalog path keeps file-source
  * pushdown (filter reaches the scan).
  */
class SqlParitySpec extends SparkSpec {

  test("≥10 declared queries are row-identical via pure SQL through graft.data") {
    assert(SqlQueries.sql.size >= 10, s"only ${SqlQueries.sql.size} texts")
    SqlQueries.configure(spark, sf)
    for ((name, text) <- SqlQueries.sql.toSeq.sortBy(_._1)) {
      val viaSql = spark.sql(text)
      val viaDf = graft.SparkEntry.queries(name)(spark, sf)
      assert(viaSql.columns.toSeq == viaDf.columns.toSeq,
        s"$name: column mismatch ${viaSql.columns.toSeq} vs ${viaDf.columns.toSeq}")
      val a = viaSql.collect().map(_.toSeq).toSeq
      val b = viaDf.collect().map(_.toSeq).toSeq
      assert(a == b, s"$name: SQL path diverged from DataFrame path " +
        s"(${a.size} vs ${b.size} rows; first diff: " +
        s"${a.zip(b).find(p => p._1 != p._2)})")
    }
  }

  test("multi_occ_count is callable from pure SQL text") {
    // SQL text `array('a','b')` parses to a foldable CreateArray, not
    // a Literal — the registered builder must accept it (r9 advice:
    // a Literal-only match made the function unusable from SQL)
    SqlQueries.configure(spark, sf)
    val got = spark.sql(
      "SELECT multi_occ_count('the cat and the dog and the cat', " +
        "array('the', 'cat')) AS n").collect().head.getSeq[Int](0)
    assert(got == Seq(3, 2), s"expected [3, 2] per-needle counts, got $got")
    // and over a real column, same result as the expression API
    val viaSql = spark.sql(
      "SELECT doc_id, multi_occ_count(text, array('the', 'a')) AS n " +
        "FROM graft.data.documents ORDER BY doc_id LIMIT 50")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    val docs = graft.model.Tables.documents(spark, sf)
    val viaExpr = docs.select(docs("doc_id"),
      graft.expressions.TextExpressions
        .multiOccCount(docs("text"), Seq("the", "a")).as("n"))
      .orderBy("doc_id").limit(50)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(viaSql == viaExpr, "SQL path diverged from expression API")
  }

  test("catalog data tables list and keep filter pushdown") {
    SqlQueries.configure(spark, sf)
    val listed = spark.sql("SHOW TABLES IN graft.data")
      .collect().map(_.getString(1)).toSet
    assert(graft.model.Tables.all.toSet.subsetOf(listed),
      s"missing tables: ${graft.model.Tables.all.toSet -- listed}")
    val df = spark.sql(
      "SELECT l_orderkey FROM graft.data.lineitem WHERE l_suppkey = 7")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("l_suppkey") && plan.contains("PushedFilters"),
      s"catalog scan must push the filter:\n$plan")
  }
}
