package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, IsNotNull, LessThan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

class SyntheticDocsSpec extends SparkSpec {

  private def scanBuilder(rows: Long, parts: Int) =
    new SyntheticDocs.SynthScanBuilder(rows, parts)

  test("doc_id range filters prune input partitions at planning time") {
    val b = scanBuilder(rows = 100000L, parts = 8)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("doc_id", 1000L),
      LessThan("doc_id", 2000L),
      IsNotNull("doc_id")))
    // the range predicates are absorbed; IsNotNull stays with Spark
    assert(residual.toSeq == Seq(IsNotNull("doc_id")), residual.toSeq)
    assert(b.pushedFilters().length == 2)
    val parts = b.build().toBatch.planInputPartitions()
    // 1000 ids / (100000/8 per part) → a single surviving split, vs 8
    // without pushdown
    assert(parts.length == 1, s"expected 1 pruned split, got ${parts.length}")
    val p = parts.head.asInstanceOf[SyntheticDocs.SynthPartition]
    assert(p.start == 1000L && p.end == 2000L, p)
  }

  test("column pruning drops the text generator entirely") {
    val b = scanBuilder(rows = 10L, parts = 1)
    b.pruneColumns(StructType(SyntheticDocs.schema.filter(_.name != "text")))
    val scan = b.build()
    assert(scan.readSchema().fieldNames.toSeq ==
      Seq("doc_id", "source", "n_chars"))
    assert(!scan.description().contains("text"))
  }

  test("end-to-end read matches the generators row for row") {
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "100").option("parts", "4").load()
    assert(df.count() == 100)
    val r = df.filter(col("doc_id") === 42L).collect().head
    assert(r.getAs[String]("source") == SyntheticDocs.genSource(42L))
    assert(r.getAs[Long]("n_chars") == SyntheticDocs.genNChars(42L))
    assert(r.getAs[String]("text") == SyntheticDocs.genText(42L))
  }

  test("count(*) is answered from metadata: pushed count in the plan, right value") {
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "100000").option("parts", "8").load()
      .filter(col("doc_id") >= 1000L && col("doc_id") < 2000L)
      .agg(count(lit(1)))
    assert(df.head().getLong(0) == 1000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed-aggs=count") && plan.contains("count=1000"),
      s"count must be answered arithmetically from the pruned range:\n$plan")
  }

  test("min/max(doc_id) push down complete: answered from the pruned range") {
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "100000").option("parts", "8").load()
      .filter(col("doc_id") >= 1000L && col("doc_id") < 2000L)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1000L, 1000L, 1999L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed-aggs=count,min,max"),
      s"the whole agg triple must be answered from metadata:\n$plan")
    // empty range: count 0, min/max NULL — global-agg semantics intact
    val e = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "100").option("parts", "2").load()
      .filter(col("doc_id") >= 500L)
      .agg(count(lit(1)), min(col("doc_id"))).head()
    assert(e.getLong(0) == 0L && e.isNullAt(1))
    // a non-pushable aggregate declines: Spark aggregates generated
    // rows and still agrees with the generator arithmetic
    val s = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "100").option("parts", "2").load()
      .agg(min(col("n_chars"))).head()
    assert(s.getLong(0) == (0L until 100L).map(SyntheticDocs.genNChars).min)
  }

  test("catalog plugin: pure-SQL access with the provider's pushdowns intact") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    // COUNT(*) through the catalog path still answers from metadata
    val cnt = spark.sql("SELECT count(*) FROM graft.synth.docs_500")
    assert(cnt.head().getLong(0) == 500L)
    assert(cnt.queryExecution.executedPlan.toString
      .contains("count=500"))
    val row = spark.sql(
      """SELECT source, n_chars FROM graft.synth.docs_500
        |WHERE doc_id = 42""".stripMargin).head()
    assert(row.getString(0) == SyntheticDocs.genSource(42L))
    assert(row.getLong(1) == SyntheticDocs.genNChars(42L))
    val tables = spark.sql("SHOW TABLES IN graft.synth")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tables.contains("docs_1000"), tables)
  }

  test("the final plan reflects the pushed range in the scan description") {
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "100000").option("parts", "8").load()
      .filter(col("doc_id") >= 1000L && col("doc_id") < 2000L)
      .select("doc_id", "source")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[1000,2000)"),
      s"pushed range must reach the scan:\n$plan")
  }
}
