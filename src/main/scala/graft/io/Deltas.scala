package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The shared skeleton of the merge-on-read delta protocol every
  * maintained view's streaming twin speaks ([[MaintainedAgg]],
  * [[graft.operators.MaintainedDistinct]],
  * [[graft.operators.MaintainedSample]]):
  *
  *   - each micro-batch's per-group delta lands under its OWN
  *     `_deltas/batch_id=<id>` partition (overwrite-in-place → a
  *     replayed batch rewrites the same bytes);
  *   - a batch id at or below the `_folded` high-water mark no-ops
  *     (its content is already in the base — the crash window between
  *     compaction and the stream's offset commit);
  *   - compaction stages the fully folded view and publishes it, the
  *     `_folded` mark, and the carried `_applied` refresh mark in ONE
  *     atomic [[StagedSwap]] rename.
  *
  * One audited copy of the `_deltas`/`_folded` contract; the views
  * supply only their fold (sum, register max, bottom-m).
  */
object Deltas {

  def dir(path: String): String = s"$path/_deltas"

  def deltaPath(path: String, batchId: Long): String =
    s"${dir(path)}/batch_id=$batchId"

  /** true when this batch is already folded into the base — the
    * [[Marks]] gate every writeDeltaPartial must check first.
    */
  def alreadyFolded(spark: SparkSession, path: String,
                    batchId: Long): Boolean =
    batchId <= Marks.readLong(spark, path, "_folded")

  def hasDeltas(spark: SparkSession, path: String): Boolean = {
    val d = new Path(dir(path))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(d) && fs.listStatus(d).nonEmpty
  }

  private def batchIds(spark: SparkSession, path: String): Seq[Long] = {
    val d = new Path(dir(path))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }.toSeq
  }

  /** Atomic-compaction skeleton: `stage` materializes the FULLY folded
    * view (base ⊎ deltas, already merged by the caller's fold) into
    * the staged dir; this publishes it with the `_folded` high-water
    * mark of every absorbed batch id and the carried `_applied`
    * refresh mark in one commit. Single-writer, as every swap table:
    * stop the maintaining ingest first.
    *
    * Publish route: a GENERATION-rooted table ([[GenTable]] — how
    * every maintained view bootstraps on non-atomic-rename backends)
    * stages directly into the next generation dir and commits by one
    * atomic pointer flip — zero copies, zero reader gap. A legacy
    * flat table keeps the [[StagedSwap]] rename dance (microsecond
    * metadata window on atomic-rename filesystems).
    */
  def compact(spark: SparkSession, path: String)
             (stage: String => Unit): Unit = {
    val live = GenTable.live(spark, path)
    val mark = (batchIds(spark, live) :+
      Marks.readLong(spark, live, "_folded")).max
    val applied = PartCommit.lastApplied(spark, live)
    def fill(stageDir: String): Unit = {
      stage(stageDir)
      Marks.writeLong(spark, stageDir, "_folded", mark)
      if (applied >= 0) PartCommit.markApplied(spark, stageDir, applied)
    }
    if (GenTable.isGenRoot(spark, path)) GenTable.swapGen(spark, path)(fill)
    else StagedSwap.swap(spark, path)(fill)
  }
}
