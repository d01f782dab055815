package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-based MERGE (upsert + delete) into a parquet table path — the
  * lake-maintenance primitive the reference's overwrite-only sinks
  * lack. Semantics per update row:
  *
  *   - key matches a base row   → REPLACE it (update)
  *   - key unmatched            → INSERT
  *   - `deleteCol` true         → REMOVE the base row, insert nothing
  *
  * The rewrite is staged-then-swap (write the merged table to
  * `path__stage`, then delete+rename), the same pattern as
  * [[graft.operators.Dedup.compactSignatures]]: the staging write
  * MATERIALIZES the result while the base is still readable (parquet
  * can't overwrite a path it is lazily reading), and the swap is a
  * filesystem rename, so a concurrent reader sees the old or the new
  * table, never a half-merged one. Single-writer assumption, as any
  * file-level table maintenance; reach for a table format
  * (Iceberg/Delta) when concurrent writers are required.
  *
  * Scale shape: one left_anti join of base against the update KEYS
  * (shuffle carries the keys, not the update payloads) plus a union —
  * the merged table is written once. At 100 TB partition the base and
  * prune the anti-join to touched partitions before merging.
  */
object MergeTable {

  /** CALLER CONTRACT: `updates` must be unique per key — two update
    * rows with the same key would BOTH land in the table (SQL MERGE
    * raises "multiple source rows matched" here; checking distributed-
    * ly would cost an extra aggregation per merge, so the contract is
    * documented instead). Pre-aggregate with e.g.
    * [[graft.operators.Relational.dedupKeepFirst]] when the batch may
    * carry intra-batch key churn.
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            keyCols: Seq[String], deleteCol: Option[String] = None): Unit = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(conf)

    val upserts = deleteCol
      .map(c => updates.filter(!col(c)).drop(c))
      .getOrElse(updates)
    // ALL update keys displace their base row — deletes by vanishing,
    // upserts by the fresh copy in the union
    val touchedKeys = updates.select(keyCols.map(col): _*).distinct()

    if (!fs.exists(target)) {
      upserts.write.mode("overwrite").parquet(path)
      return
    }
    val staging = new org.apache.hadoop.fs.Path(path + "__stage")
    spark.read.parquet(path)
      .join(touchedKeys, keyCols, "left_anti")
      .unionByName(upserts)
      .write.mode("overwrite").parquet(staging.toString)
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"merge swap failed: $staging -> $path")
  }
}
