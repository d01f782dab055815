package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the iterative operators
  * (connectedComponents, pageRank, kmeans — anything that loops a
  * plan back onto itself).
  *
  * `localCheckpoint` (the default) truncates lineage into executor
  * block storage: eager, cheap, perfect for local/batch runs — but on
  * a real cluster an executor loss makes those blocks unrecoverable
  * and the JOB fails (there is no lineage left to recompute from). At
  * 100 TB × hours-long iterative jobs that is a real operational risk,
  * so every iterative loop routes its truncation through [[stabilize]]:
  * when the session has a RELIABLE checkpoint directory configured
  * (`spark.sparkContext.setCheckpointDir(hdfs://…)`), loop state is
  * written there with `checkpoint()` instead — executor loss then
  * recovers by re-reading the checkpoint files. Opting in is one line
  * of cluster config; no operator code changes.
  */
object Checkpoints {

  /** Truncate lineage: reliable `checkpoint()` when the session has a
    * checkpoint dir (and `spark.graft.reliableCheckpoint` isn't
    * "never" — the escape hatch for callers that set a checkpoint dir
    * for OTHER purposes), `localCheckpoint()` otherwise. Both are
    * EAGER — callers rely on single evaluation of expensive subtrees.
    *
    * The reliable path persists before checkpointing: an uncached
    * eager `checkpoint()` runs the materializing count AND the
    * checkpoint write as two jobs over the full lineage — double
    * compute per iteration, in exactly the hours-long regime this
    * mode exists for. The transient cache is dropped once the
    * checkpoint files are the source of truth. Checkpoint FILES
    * accumulate per iteration by default — long-running sessions
    * should set `spark.cleaner.referenceTracking.cleanCheckpoints=
    * true` (see the README knob table) so superseded snapshots are
    * GC'd with their datasets.
    */
  def stabilize(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val mode = session.conf
      .get("spark.graft.reliableCheckpoint", "auto").trim.toLowerCase
    // fail fast on typos ("false", "off", …): anything unrecognized
    // would otherwise silently ENABLE reliable checkpointing whenever
    // a checkpoint dir happens to be set for other purposes. Casing /
    // surrounding whitespace of the two documented values is accepted.
    require(mode == "auto" || mode == "never",
      s"spark.graft.reliableCheckpoint must be 'auto' or 'never', got '$mode'")
    val wantReliable =
      mode != "never" && session.sparkContext.getCheckpointDir.isDefined
    if (wantReliable) {
      val cached = df.persist()
      try cached.checkpoint()
      finally cached.unpersist(blocking = false)
    } else df.localCheckpoint()
  }
}
