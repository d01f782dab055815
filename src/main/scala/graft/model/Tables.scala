package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the harness tables (TPC-H-ish star schema + events +
  * documents + embeddings; see /root/repo/TESTDATA.md). One parquet
  * directory per table under a scale-factor dir.
  *
  * At 100 TB each of these becomes a partitioned parquet dataset; the
  * loader stays the same — `spark.read.parquet(dir)` reads a
  * directory tree, and Catalyst does partition pruning when the layout
  * is hive-partitioned. Nothing here assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright; read the nanos as a long and truncate to
    * microseconds (integer `div` — the ns epoch exceeds 2^53, so any
    * double round-trip would corrupt it). The harness data carries no
    * sub-microsecond precision, so the truncation is lossless.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session build by [[graft.Sessions.tuned]] — NOT mutated here: a
    * per-read `conf.set` silently changes how every later parquet read
    * on the shared session interprets nanos timestamps, and races
    * under the orchestrator's multi-threaded driver.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events needs spark.sql.legacy.parquet.nanosAsLong=true (Sessions.tuned sets it)")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
