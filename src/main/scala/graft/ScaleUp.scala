package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-data scale-up: replicate an sf directory `factor`× with
  * entity-key offsetting, so the bench can run at sf1.0-equivalent
  * volume (10× sf0.1) — past the page cache, into real shuffle spill
  * and AQE coalescing — without inventing new generators. Replica r's
  * foreign keys are offset by r·(max_key+1) consistently across
  * tables, so join fan-outs per key are IDENTICAL to the source sf:
  * the data gets bigger, not weirder. Dimension tables with fixed
  * cardinality (region, nation) are copied as-is, exactly like TPC-H
  * scaling.
  *
  * Document TEXT gets a per-replica token prefix (`r3_word`), which
  * disjoins the replicas' token/shingle spaces: each replica carries
  * the source corpus's near-dup structure but NO cross-replica
  * similarity, so dedup/pair queries scale linearly in data volume
  * instead of quadratically in clone-cluster size (verbatim
  * replication would make every doc a factor-sized exact-dup cluster
  * and conflate output explosion with plan regressions). EMBEDDINGS
  * are replicated verbatim (no text to disjoin) — embedding-pair and
  * brute-force-ANN queries therefore scale superlinearly BY
  * CONSTRUCTION at this leg (queries × corpus both grow), which the
  * bench table calls out rather than hides.
  *
  * Bench-tooling only: correctness always runs against the
  * driver-generated sf directories.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {

  /** Tables replicated with these key columns offset; absent = copy. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
  )
  private val copyAsIs = Seq("region", "nation")

  /** Offsets must be consistent ACROSS tables (orders.o_custkey and
    * customer.c_custkey must shift by the same stride), so the stride
    * for each key family comes from its owning table.
    */
  private def stride(spark: SparkSession, src: String, table: String,
                     col0: String): Long = {
    val df = spark.read.parquet(s"$src/$table.parquet")
    // key columns are integral but not necessarily LongType
    df.agg(max(col(col0))).head().getAs[Number](0).longValue() + 1L
  }

  def scaleTable(df: DataFrame, cols: Map[String, Long], factor: Int,
                 dropReplica: Boolean = true): DataFrame = {
    val rep = df.sparkSession.range(factor.toLong)
      .withColumnRenamed("id", "__r")
    val crossed = df.crossJoin(broadcast(rep))
    val keyed = cols.foldLeft(crossed) { case (acc, (c, s)) =>
      acc.withColumn(c, col(c) + col("__r") * s)
    }
    if (dropReplica) keyed.drop("__r") else keyed
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorStr) = args.take(3)
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().min(32).toString)
    val spark = Sessions.tuned(
      SparkSession.builder()
        .master(Sessions.master(cpus.toInt))
        .appName("graft-scaleup")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key-family strides from the owning tables
    val strides = Map(
      "c_custkey" -> stride(spark, src, "customer", "c_custkey"),
      "s_suppkey" -> stride(spark, src, "supplier", "s_suppkey"),
      "p_partkey" -> stride(spark, src, "part", "p_partkey"),
      "o_orderkey" -> stride(spark, src, "orders", "o_orderkey"),
      "event_id" -> stride(spark, src, "events", "event_id"),
      "user_id" -> stride(spark, src, "events", "user_id"),
      "doc_id" -> stride(spark, src, "documents", "doc_id"),
      "vec_id" -> stride(spark, src, "embeddings", "vec_id"),
    )
    def strideFor(c: String): Long = c match {
      case "o_custkey" => strides("c_custkey")
      case "l_orderkey" => strides("o_orderkey")
      case "l_partkey" => strides("p_partkey")
      case "l_suppkey" => strides("s_suppkey")
      case other => strides(other)
    }

    copyAsIs.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    keyCols.foreach { case (t, cols0) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val scaled0 = scaleTable(df, cols0.map(c => c -> strideFor(c)).toMap,
        factor, dropReplica = t != "documents")
      // disjoin replica token spaces (see scaladoc); keep n_chars
      // consistent with the rewritten text
      val scaled = if (t == "documents") scaled0
        .withColumn("text", when(col("text").isNull, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(^|\\s)"),
            concat(lit("$1r"), col("__r"), lit("_")))))
        // null text is left null by the rewrite — keep its ORIGINAL
        // n_chars (possibly null) instead of coercing to 0
        .withColumn("n_chars", when(col("text").isNull, col("n_chars"))
          .otherwise(length(col("text")).cast(df.schema("n_chars").dataType)))
        .drop("__r")
      else scaled0
      scaled
        // spread replicas across output files so downstream scans see
        // balanced splits, not one file per replica of the source order
        .repartition(cpus.toInt * 2)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t x$factor done")
    }
    spark.stop()
  }
}
