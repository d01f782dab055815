package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every query module's (implementation, oracle) pairs.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline extensions (text analysis, dedup,
    * similarity search, event analytics).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      MultimodalQueries.queries ++ CatalogQueries.queries ++
      TemporalQueries.queries ++ CurationQueries.queries ++
      SketchQueries.queries ++ MiningQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ TextQueries.oracleSql ++ DedupQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ EventQueries.oracleSql ++
      CatalogQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      TemporalQueries.oracleSql ++ CurationQueries.oracleSql ++
      SketchQueries.oracleSql ++ MiningQueries.oracleSql
}
