package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Opt-in scaling smoke for the ITERATIVE paths (transitive dedup and
  * the composed curation pipeline): runs each at N and 10N generated
  * docs and reports the wall-clock ratio. The iterative operators are
  * the ones where a quadratic tail would hide at a single test scale —
  * a pair-graph blowup or a lineage-growth bug shows up here as a
  * ratio far above the data growth, long before a cluster bench would
  * catch it. Exits non-zero when the 10× ratio exceeds
  * `GRAFT_SMOKE_MAX_RATIO` (default 40; quadratic would be ~100).
  *
  * Docs are generated distributively (spark.range + hash arithmetic,
  * no driver-side data): clusters of 5 near-dups sharing a 28-token
  * base with one distinguishing suffix token each, so the near-dup
  * pair graph grows LINEARLY with the corpus (10 intra-cluster pairs
  * per 5 docs) — the shape a real corpus has, and the precondition
  * for the connected-components loop being cheap.
  */
object ScaleSmoke {

  private def gen(spark: SparkSession, n: Long): DataFrame = {
    val group = col("id") - pmod(col("id"), lit(5))
    val tokens = (0 until 28).map(j =>
      concat(lit("w"), pmod(hash(group * lit(131 + j)), lit(5000)))) :+
      concat(lit("x"), pmod(col("id"), lit(5)))
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", tokens: _*).as("text"),
      pmod(col("id"), lit(7)).cast("string").as("source"))
  }

  private def best2(f: => Long): Double =
    (1 to 2).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_SMOKE_N", "5000").toLong
    val maxRatio = sys.env.getOrElse("GRAFT_SMOKE_MAX_RATIO", "40").toDouble
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    def runTier(rows: Long): (Double, Double) = {
      val transitive = best2(
        Dedup.dedupCorpusTransitive(gen(spark, rows), "doc_id", "text")
          .count())
      val pipeline = best2(
        Curation.curateCorpus(gen(spark, rows), "doc_id", "text", "source")
          .count())
      (transitive, pipeline)
    }

    val (t1, p1) = runTier(n)
    val (t10, p10) = runTier(n * 10)
    val rT = t10 / t1
    val rP = p10 / p1
    println(s"""{"metric":"scale_smoke","n":$n,""" +
      f""""transitive_1x":$t1%.2f,"transitive_10x":$t10%.2f,"transitive_ratio":$rT%.1f,""" +
      f""""pipeline_1x":$p1%.2f,"pipeline_10x":$p10%.2f,"pipeline_ratio":$rP%.1f,""" +
      s""""max_ratio":$maxRatio}""")
    spark.stop()
    if (rT > maxRatio || rP > maxRatio) {
      System.err.println(
        f"[scale-smoke] FAIL: 10x ratio transitive=$rT%.1f pipeline=$rP%.1f exceeds $maxRatio")
      sys.exit(1)
    }
  }
}
