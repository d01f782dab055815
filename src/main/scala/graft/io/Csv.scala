package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink (SURVEY.md §2.1 S1/S4).
  *
  * The reference reads every stage through pandas `read_csv` on raw
  * bytes (steps/step3_remove_columns.py:46-50 et al.) and writes
  * single headered CSV files (:63-70). Spark mapping:
  * - read: headered CSV; Spark's UTF-8 reader strips the BOM the INE
  *   exports carry on the first header cell (FIXTURES.md).
  * - schema: explicit `StructType` fast path when the catalog knows
  *   it; `inferSchema` fallback (double-scans — acceptable for KB-MB
  *   config-like tables, never for the 100 TB fact path).
  * - write: multi-part by default (scale path); `singleFile = true`
  *   reproduces the reference's one-file-per-table layout for golden
  *   comparisons (coalesce(1) — driver-adjacent, small outputs only).
  */
object Csv {

  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true").option("encoding", "UTF-8")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
  }

  /** INE-shaped fast path: header-only schema discovery (all strings)
    * with the measurement `Value` column cast to double — one scan
    * instead of inferSchema's two, exact for the long-table shape
    * where every non-Value column is a code/label string anyway.
    */
  def readLongTable(spark: SparkSession, path: String,
                    valueCol: String = "Value"): DataFrame = {
    val df = spark.read.option("header", "true").option("encoding", "UTF-8")
      .csv(path)
    if (df.columns.contains(valueCol))
      df.withColumn(valueCol,
        org.apache.spark.sql.functions.col(valueCol).cast("double"))
    else df
  }

  /** Write CSV. Default: multi-part directory (the scale path).
    * `singleFile = true` produces ONE file at exactly `path` — the
    * reference's `{view}.csv` layout
    * (steps/step5_create_views.py:416-423) — via a temp directory +
    * Hadoop `FileSystem.rename` of the part file (works on `file://`
    * and `s3a://` alike). Driver-adjacent; small outputs only.
    */
  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    if (!singleFile)
      df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    else {
      import org.apache.hadoop.fs.Path
      val target = new Path(path)
      val fs = target.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      val tmp = new Path(path + "_spark_write_tmp")
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(
          s"no part file under $tmp"))
      if (fs.exists(target)) fs.delete(target, true)
      // Hadoop rename reports most failures via the boolean, not an
      // exception — an unchecked false here followed by the temp-dir
      // delete would silently destroy the only copy of the output
      if (!fs.rename(part, target))
        throw new java.io.IOException(s"rename $part -> $target failed")
      fs.delete(tmp, true)
    }
}
