package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Versioned

/** The writable `versioned` catalog namespace: pure-SQL DDL/DML onto
  * the manifest log — CREATE bootstraps an empty schema-pinned v0,
  * INSERT INTO appends a version, INSERT OVERWRITE snapshots, DROP
  * deletes the log, and the underlying log keeps time travel.
  */
class VersionedCatalogSpec extends SparkSpec {
  import spark.implicits._

  // a dedicated catalog NAME: CatalogManager caches plugin instances
  // per name on first use, so re-pointing an already-initialized
  // catalog's options is silently ignored — a shared "graft" name
  // would race other suites for whichever options initialized first
  private lazy val root: String = {
    val r = s"${sys.props("java.io.tmpdir")}/graft_vcat_${System.nanoTime()}"
    spark.conf.set("spark.sql.catalog.graftv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftv.versionedDir", r)
    r
  }

  test("SQL lifecycle: CREATE, INSERT, OVERWRITE, time travel, DROP") {
    root
    spark.sql("CREATE TABLE graftv.versioned.t (k BIGINT, v STRING)")
    // empty bootstrap reads back as a typed empty frame
    assert(spark.table("graftv.versioned.t").count() == 0)
    spark.sql("INSERT INTO graftv.versioned.t VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT * FROM graftv.versioned.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
    spark.sql("INSERT INTO graftv.versioned.t VALUES (3, 'c')")
    assert(spark.table("graftv.versioned.t").count() == 3)
    // snapshot reads carry the file-source pushdown surface
    val plan = spark.sql("SELECT k FROM graftv.versioned.t WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,2)]"),
      s"snapshot scan must push filters:\n$plan")
    spark.sql("INSERT OVERWRITE graftv.versioned.t VALUES (9, 'z')")
    assert(spark.table("graftv.versioned.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "z")))
    // the log underneath: v0 bootstrap + three commits; time travel
    // still reads the pre-overwrite snapshot
    assert(Versioned.versions(spark, s"$root/t") == Seq(0L, 1L, 2L, 3L))
    assert(Versioned.read(spark, s"$root/t", asOf = Some(2L)).count() == 3)
    // the DataFrame writeTo API lands in the same log
    Seq((10L, "w")).toDF("k", "v").writeTo("graftv.versioned.t").append()
    assert(spark.table("graftv.versioned.t").count() == 2)
    val tables = spark.sql("SHOW TABLES IN graftv.versioned")
      .select("tableName").as[String].collect().toSet
    assert(tables.contains("t"), tables)
    spark.sql("DROP TABLE graftv.versioned.t")
    intercept[Exception](spark.table("graftv.versioned.t").collect())
  }

  test("schema evolution through SQL writes: union on append, conflict refused") {
    root
    spark.sql("CREATE TABLE graftv.versioned.e (k BIGINT)")
    spark.sql("INSERT INTO graftv.versioned.e VALUES (1)")
    // a wider append through the raw log: old rows null-fill the new
    // column and the SQL surface reads the evolved snapshot
    Versioned.commit(spark, s"$root/e",
      Seq((2L, "x")).toDF("k", "extra"), "append")
    val rows = spark.table("graftv.versioned.e").orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(1L -> None, 2L -> Some("x")))
    // a same-name type conflict is refused, not silently coerced
    intercept[IllegalArgumentException](
      Versioned.commit(spark, s"$root/e",
        Seq(("oops", 1L)).toDF("k", "n"), "append"))
  }

  test("DDL edge semantics: duplicate CREATE, bad properties, torn state") {
    root
    spark.sql("CREATE TABLE graftv.versioned.d (k BIGINT)")
    // duplicate CREATE throws Spark's standard DDL exception (so the
    // analyzer's IF NOT EXISTS path can match it) …
    intercept[org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException](
      spark.sql("CREATE TABLE graftv.versioned.d (k BIGINT)"))
    // … and IF NOT EXISTS is therefore a clean no-op
    spark.sql("CREATE TABLE IF NOT EXISTS graftv.versioned.d (k BIGINT)")
    // a provider or property the log cannot honor is REFUSED, not
    // silently dropped: USING csv must not "succeed" as parquet
    val csvErr = intercept[Exception](
      spark.sql("CREATE TABLE graftv.versioned.dcsv (k BIGINT) USING csv"))
    assert(csvErr.getMessage.contains("unsupported table property"),
      csvErr.getMessage)
    val propErr = intercept[Exception](spark.sql(
      "CREATE TABLE graftv.versioned.dprop (k BIGINT) " +
        "TBLPROPERTIES ('compression'='zstd')"))
    assert(propErr.getMessage.contains("unsupported table property"),
      propErr.getMessage)
    // the refused creates must not have left half-made tables behind
    val listed = spark.sql("SHOW TABLES IN graftv.versioned")
      .select("tableName").as[String].collect().toSet
    assert(!listed.contains("dcsv") && !listed.contains("dprop"), listed)
    // explicit USING parquet is the log's native format — accepted
    spark.sql("CREATE TABLE graftv.versioned.dpq (k BIGINT) USING parquet")
    assert(spark.table("graftv.versioned.dpq").count() == 0)
    // torn state: _manifests/ created but the crash hit before the v0
    // manifest publish — the table must read as nonexistent (not
    // listed, loads fail as NoSuchTable, CREATE can re-bootstrap it)
    val torn = new org.apache.hadoop.fs.Path(s"$root/torn/_manifests")
    torn.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(torn)
    val listed2 = spark.sql("SHOW TABLES IN graftv.versioned")
      .select("tableName").as[String].collect().toSet
    assert(!listed2.contains("torn"), listed2)
    intercept[org.apache.spark.sql.AnalysisException](
      spark.table("graftv.versioned.torn").collect())
    spark.sql("CREATE TABLE graftv.versioned.torn (k BIGINT)")
    assert(spark.table("graftv.versioned.torn").count() == 0)
  }
}
