package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Table-layout writer for scan-efficiency at rest. Hive partitioning
  * prunes DIRECTORIES (coarse, categorical); within each partition,
  * per-file sorting is what makes parquet row-group min/max statistics
  * selective, so point/range predicates on the sort key skip whole row
  * groups at scan time — the data-skipping layer under partition
  * pruning, and the difference between reading 1% and 100% of a
  * partition at 100 TB.
  */
object Layout {

  /** Write `df` hive-partitioned by `partitionCols` with files SORTED
    * on `sortCols` inside each partition: one shuffle on the partition
    * key, then a partition-local sort (no global ordering — a total
    * sort would be a pointless second exchange; row-group stats only
    * need per-file monotonicity).
    */
  def writeClustered(df: DataFrame, path: String,
                     partitionCols: Seq[String],
                     sortCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty && sortCols.nonEmpty,
      "need at least one partition column and one sort column")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files (append-heavy tables accumulate one
    * file per write — at 100 TB the resulting listing/open overhead
    * dominates scans long before data volume does). Staged write +
    * rename swap, same reader-safety contract as
    * [[MergeTable.merge]]; single-writer assumption.
    */
  def compactDir(spark: org.apache.spark.sql.SparkSession, path: String,
                 targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(conf)
    val totalBytes = fs.getContentSummary(target).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val staging = new org.apache.hadoop.fs.Path(path + "__compact")
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(staging.toString)
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"compaction swap failed: $staging -> $path")
  }
}
