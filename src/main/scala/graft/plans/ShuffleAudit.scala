package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Measured (not guessed) shuffle accounting for a query: execute the
  * plan, then read the actual SQLMetrics off every exchange node in
  * the FINAL (post-AQE) executed plan. Plan-string audits
  * (PlanAuditSpec) pin the plan SHAPE; this pins the plan's runtime
  * VOLUME — how many records and bytes really crossed the wire.
  * That's the number that decides whether an operator survives a
  * 100× scale-up: "one Exchange" is fine, "one Exchange moving the
  * whole corpus" is not. Run it at sample scale in CI and assert
  * ceilings (see ShuffleAuditSpec) — a regression that starts
  * shuffling document text instead of digests fails the bound long
  * before it fails a cluster.
  *
  * Caveats: metrics come from exchange nodes reachable through the
  * main plan tree (query stages are unwrapped; subquery plans are
  * not traversed). Reused exchanges are counted separately and their
  * metrics are not double-summed.
  */
object ShuffleAudit {

  /** exchanges = distinct shuffle exchanges executed; broadcasts =
    * broadcast exchanges; reusedExchanges = reuse references (free at
    * runtime); shuffleRecords / shuffleBytes = summed write-side
    * metrics over the distinct shuffles.
    */
  case class ShuffleStats(exchanges: Int, broadcasts: Int,
                          reusedExchanges: Int, shuffleRecords: Long,
                          shuffleBytes: Long)

  /** Execute `df` and return its measured shuffle stats. The action
    * drives THIS DataFrame's own QueryExecution (`toRdd.foreach`) —
    * `df.foreach`/`df.count` would build a fresh QueryExecution and
    * the metrics would accrue on that invisible copy. No driver
    * collect: rows are consumed where they are produced.
    */
  def measure(df: DataFrame): ShuffleStats = {
    df.queryExecution.toRdd.foreach(_ => ())
    stats(df)
  }

  /** Read stats from an ALREADY-executed DataFrame (metrics are zero
    * until an action has run).
    */
  def stats(df: DataFrame): ShuffleStats = {
    val nodes = flatten(df.queryExecution.executedPlan)
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }.distinct
    val reused = nodes.collect { case r: ReusedExchangeExec => r }
    val bcasts = nodes.collect { case b: BroadcastExchangeLike => b }.distinct
    def metric(p: SparkPlan, key: String): Long =
      p.metrics.get(key).map(_.value).getOrElse(0L)
    ShuffleStats(
      shuffles.size, bcasts.size, reused.size,
      shuffles.map(metric(_, "shuffleRecordsWritten")).sum,
      shuffles.map(metric(_, "shuffleBytesWritten")).sum)
  }

  // private[graft]: specs outside this package read per-operator
  // metrics (numSkipped, numOutputRows) through the same unwrapping
  private[graft] def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }
}

/** Measured scan accounting — the scan-side sibling of
  * [[ShuffleAudit]]: execute a query and read how many rows its
  * parquet scans actually EMITTED. With the vectorized reader, pushed
  * predicates prune at row-group/page granularity using min/max
  * stats, so `rowsRead` directly measures whether a layout's
  * clustering makes the statistics selective — the number that
  * decides if a 100 TB point query reads gigabytes or terabytes.
  * Layout changes (sort keys, Z-order) should be justified with THIS
  * measurement, not a plan string.
  */
object ScanAudit {

  case class ScanStats(scans: Int, rowsRead: Long)

  /** Execute `df` (its own QueryExecution, no fresh copy) and sum the
    * `numOutputRows` metric over its file scans — rows surviving
    * row-group pruning, BEFORE any post-scan Filter.
    */
  def measure(df: DataFrame): ScanStats = {
    df.queryExecution.toRdd.foreach(_ => ())
    val nodes = ShuffleAudit.flatten(df.queryExecution.executedPlan)
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.distinct
    ScanStats(scans.size,
      scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum)
  }

  /** Like [[measure]], but counts only file scans whose Location
    * contains `pathPart` — for plans reading several tables where the
    * pruning evidence is about ONE of them (e.g. a stored-index probe
    * whose plan also scans the query batch and the centroids).
    */
  def measureFor(df: DataFrame, pathPart: String): ScanStats = {
    df.queryExecution.toRdd.foreach(_ => ())
    val scans = ShuffleAudit.flatten(df.queryExecution.executedPlan)
      .collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains(pathPart)) => s
      }.distinct
    ScanStats(scans.size,
      scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum)
  }
}
