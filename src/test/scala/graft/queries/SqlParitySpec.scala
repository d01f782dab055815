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

  // ---- stored-artifact parity: the dedup/ANN families from pure SQL

  private lazy val storedRoot: String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_stored_").toString
    // a dedicated catalog name: plugin instances cache per name on
    // first use, so re-pointing options on a shared name is ignored
    spark.conf.set("spark.sql.catalog.graftst",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftst.storedDir", root)
    val docs = graft.model.Tables.documents(spark, sf)
    val sigs = graft.operators.Dedup.minhashSignatures(
      graft.operators.Dedup.docShingles(docs, "doc_id", "text", 3,
        dedup = false), "doc_id")
    graft.operators.Dedup.writeSignatures(sigs, "doc_id", s"$root/sigs")
    root
  }

  test("stored signature table reads back identically from pure SQL") {
    storedRoot
    val viaSql = spark.sql(
      "SELECT doc_id, mh0, mh7, mh15 FROM graftst.stored.sigs " +
        "ORDER BY doc_id").collect().map(_.toSeq).toSeq
    val viaDf = graft.operators.Dedup
      .readSignatures(spark, s"$storedRoot/sigs")
      .select("doc_id", "mh0", "mh7", "mh15")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty && viaSql == viaDf,
      s"SQL sigs diverged (${viaSql.size} vs ${viaDf.size})")
  }

  test("LSH band self-join from pure SQL ≡ Dedup.lshCandidatePairs") {
    storedRoot
    // the band keys as SQL structs — 4 bands × 4 rows (Portable)
    val bands = (0 until graft.functions.Portable.NumBands).map { b =>
      // field ALIASES make the four struct types identical (SQL infers
      // struct field names from the source columns otherwise, and
      // array() refuses mixed struct types)
      val rows = (0 until graft.functions.Portable.RowsPerBand)
        .map(r =>
          s"mh${b * graft.functions.Portable.RowsPerBand + r} AS r$r")
      s"struct($b AS b, ${rows.mkString(", ")})"
    }
    val text =
      s"""WITH keyed AS (
         |  SELECT doc_id AS id, explode(array(${bands.mkString(", ")}))
         |    AS band_key
         |  FROM graftst.stored.sigs)
         |SELECT a.id AS id_a, b.id AS id_b
         |FROM keyed a JOIN keyed b ON a.band_key = b.band_key
         |WHERE a.id < b.id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    val viaSql = spark.sql(text)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = graft.operators.Dedup.lshCandidatePairs(
      graft.operators.Dedup.readSignatures(spark, s"$storedRoot/sigs"),
      "doc_id")
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql.nonEmpty && viaSql == viaDf,
      s"SQL band join diverged (${viaSql.size} vs ${viaDf.size} pairs)")
  }

  test("sig_part point-read from pure SQL prunes partitions like readSignaturesFor") {
    storedRoot
    val wanted = graft.model.Tables.documents(spark, sf)
      .select("doc_id").orderBy("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    // the reader-side partition recompute — the same client-side step
    // readSignaturesFor does (parts become STATIC literals, so the
    // partition filter prunes at plan time, no runtime subquery): the
    // SQL twin computes them with the engine's own portable hash
    import org.apache.spark.sql.functions.{col, lit}
    val parts = graft.model.Tables.documents(spark, sf)
      .select("doc_id").orderBy("doc_id").limit(3)
      .select((graft.functions.Portable.hash32(col("doc_id")
        .cast("string")) % lit(graft.operators.Dedup.SigParts))
        .cast("int").as("p"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val df = spark.sql(
      s"""SELECT doc_id, mh0, mh15 FROM graftst.stored.sigs
         |WHERE sig_part IN (${parts.mkString(", ")})
         |  AND doc_id IN (${wanted.mkString(", ")})
         |ORDER BY doc_id""".stripMargin)
    val viaSql = df.collect().map(_.getLong(0)).toSeq
    val viaDf = graft.operators.Dedup.readSignaturesFor(spark,
      s"$storedRoot/sigs",
      graft.model.Tables.documents(spark, sf)
        .select("doc_id").orderBy("doc_id").limit(3), "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaDf && viaSql.size == 3, s"$viaSql vs $viaDf")
    // and the SQL filter prunes at the PARTITION level
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("sig_part"),
      s"sig_part must prune at the partition level:\n$plan")
  }

  test("stored vector index: cell histogram from pure SQL ≡ DataFrame") {
    storedRoot
    val emb = graft.model.Tables.embeddings(spark, sf)
    val cents = graft.operators.Similarity
      .kmeans(emb, "vec_id", "embedding", k = 4, iters = 3)._2
    graft.operators.Similarity.writeVectorIndex(emb, "vec_id",
      "embedding", cents, s"$storedRoot/vidx")
    val viaSql = spark.sql(
      "SELECT cell, count(*) AS n, count(DISTINCT vec_id) AS ids " +
        "FROM graftst.stored.vidx.vectors GROUP BY cell ORDER BY cell")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val viaDf = graft.operators.Similarity
      .readVectorIndex(spark, s"$storedRoot/vidx")
      .groupBy("cell")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.countDistinct("vec_id").as("ids"))
      .orderBy("cell")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql.nonEmpty && viaSql == viaDf,
      s"SQL index scan diverged: $viaSql vs $viaDf")
    // a one-cell probe prunes the vectors scan at the partition level
    val probe = spark.sql(
      s"SELECT count(*) FROM graftst.stored.vidx.vectors WHERE cell = " +
        viaSql.head._1)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("cell"), s"cell filter must prune:\n$plan")
  }

  test("stored loadTable gates on table SHAPE, not bare existence") {
    storedRoot
    val emb = graft.model.Tables.embeddings(spark, sf)
    val cents = graft.operators.Similarity
      .kmeans(emb, "vec_id", "embedding", k = 4, iters = 3)._2
    graft.operators.Similarity.writeVectorIndex(emb, "vec_id",
      "embedding", cents, s"$storedRoot/gidx")
    // the index ROOT is a nested namespace (its artifacts nest);
    // resolving it as a table used to schema-error deep in the scan —
    // it must be a clean table-not-found at resolution time
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM graftst.stored.gidx").collect())
    // `_`-prefixed internals are never tables, even as leaf segments
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM graftst.stored.gidx.`_nope`").collect())
    // while its parquet leaves load fine
    assert(spark.sql(
      "SELECT count(*) FROM graftst.stored.gidx.vectors")
      .head().getLong(0) > 0)
  }

  test("stored namespace refuses path-traversal identifiers") {
    storedRoot
    // backtick-quoting admits arbitrary identifier characters; a
    // dot-dot segment must read as no-such-table, never resolve a
    // path OUTSIDE the configured storedDir
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM graftst.stored.`..`.`..`.etc").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM graftst.stored.`../sigs`").collect())
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
