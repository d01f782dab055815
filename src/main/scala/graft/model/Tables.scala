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

  /** Does this sf dir carry a MATERIALIZED partsupp table?
    * [[graft.ScaleUp]] emits one; the driver-generated testdata dirs
    * do not.
    */
  def hasPartsupp(s: SparkSession, d: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$d/partsupp.parquet")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The TPC-H partsupp relation — STORED when the sf dir carries one
    * (ScaleUp emits it, so the scale legs run Q2/Q9/Q11/Q16/Q20 in
    * their true stored-table shapes), otherwise DERIVED from lineitem
    * by the one canonical rule and memoized per (session, sfDir) so a
    * sweep derives it once, not once per consuming query:
    *
    *   ps_supplycost      = min(l_extendedprice / l_quantity)  — the
    *     min unit price ever charged; min over IEEE divisions is
    *     order-independent and bit-identical cross-engine.
    *   ps_supplycost_mils = min(floor(l_extendedprice * 1e6
    *     / l_quantity)) AS BIGINT — the EXACT-ARITHMETIC twin for
    *     sum-shaped consumers (Q9 profit, Q11 value): summing the
    *     double ps_supplycost would be float-order-dependent, summing
    *     integer millionths in decimals is exact.
    *   ps_availqty        = sum(l_quantity) AS BIGINT — quantities are
    *     integer-valued, so the sum is exact in doubles and the cast
    *     total.
    *
    * The derivation is deterministic and order-independent, so stored
    * ≡ derived value-for-value, and the DuckDB oracle can inline the
    * same SQL ([[graft.queries.CoreQueries]]'s psDerivedSql).
    */
  def partsupp(s: SparkSession, d: String): DataFrame =
    if (hasPartsupp(s, d)) load(s, d, "partsupp")
    else {
      val li = lineitem(s, d)
      graft.Memo.shared(graft.Memo.dfKey(li, "partsupp", d))(
        derivePartsupp(li).localCheckpoint())
    }

  /** The canonical derivation (see [[partsupp]]); ScaleUp materializes
    * exactly this over the scaled lineitem.
    */
  def derivePartsupp(li: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    li.groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(
        min(col("l_extendedprice") / col("l_quantity"))
          .as("ps_supplycost"),
        min(floor(col("l_extendedprice") * lit(1000000L)
          / col("l_quantity"))).cast("long").as("ps_supplycost_mils"),
        sum(col("l_quantity")).cast("long").as("ps_availqty"))
  }
  /** Normalize the events `ts` column across testdata generations to
    * ONE canonical type, `TimestampType` in the UTC session zone:
    *
    *   - TIMESTAMP(NANOS) layouts (older harness data) are readable
    *     only as nanos longs (`spark.sql.legacy.parquet.nanosAsLong=
    *     true`, set once by [[graft.Sessions.tuned]] — never per-read:
    *     a per-read `conf.set` silently changes every later parquet
    *     read on the shared session and races under a multi-threaded
    *     driver); truncate to micros with integer `div` — the ns epoch
    *     exceeds 2^53, so a double round-trip would corrupt it;
    *   - plain timestamp[us] layouts (current harness data) arrive as
    *     `TIMESTAMP_NTZ`; cast to `TimestampType` — wall-clock-
    *     identical under the UTC session zone, which is also exactly
    *     how the DuckDB oracle reads the same file.
    *
    * Works on batch and streaming frames alike (pure column ops).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Wrap an events-parquet read so Spark's raw "Illegal Parquet
    * type: INT64 (TIMESTAMP(NANOS,…))" failure carries the
    * remediation hint; shared by the batch loader and the streaming
    * schema-inference read ([[graft.streaming.Streams.fileEventStream]]).
    */
  def explainNanos[T](body: => T): T = try body catch {
    case e: Exception if String.valueOf(e.getMessage).contains("NANOS") =>
      throw new IllegalArgumentException(
        "events.parquet stores TIMESTAMP(NANOS): set " +
          "spark.sql.legacy.parquet.nanosAsLong=true (Sessions.tuned does)", e)
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(explainNanos(load(s, d, "events")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
