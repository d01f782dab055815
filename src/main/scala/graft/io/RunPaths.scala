package graft.io

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dated-run output management (SURVEY.md §2.1 S9 + §2.5 O4).
  *
  * The reference lays runs out as `outputs/DD-MM-YYYY/{raw,views,
  * reportes}`, deletes a same-day run before starting
  * (pipeline_orchestrator.py:38-69) and discovers the newest run by
  * reverse-sorting the dated folders
  * (steps/step2_standardize_names.py:26). Here that is Hadoop
  * FileSystem work — the same code runs on `file://` and `s3a://`.
  * Sorting is by PARSED date, not by string: the reference's
  * lexicographic reverse sort on DD-MM-YYYY actually mis-orders months
  * ("31-01-2026" > "01-02-2026"); we keep its folder format but fix
  * the ordering, since "newest run" is the semantic contract.
  */
object RunPaths {

  private val fmt = DateTimeFormatter.ofPattern("dd-MM-yyyy")

  def runFolder(date: LocalDate): String = date.format(fmt)

  def runDir(base: String, date: LocalDate): String =
    s"$base/${runFolder(date)}"

  def viewsDir(base: String, date: LocalDate): String =
    s"${runDir(base, date)}/views"

  def reportsDir(base: String, date: LocalDate): String =
    s"${runDir(base, date)}/reportes"

  /** All dated run folders under `base`, newest first. */
  def listRuns(spark: SparkSession, base: String): Seq[(LocalDate, String)] = {
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        Try(LocalDate.parse(st.getPath.getName, fmt)).toOption
          .map(d => (d, st.getPath.toString))
      }
      .sortBy(_._1)(Ordering[LocalDate].reverse)
  }

  /** Newest dated run folder, if any. */
  def latestRun(spark: SparkSession, base: String): Option[String] =
    listRuns(spark, base).headOption.map(_._2)

  /** Idempotent re-run: delete an existing same-day folder so the new
    * run starts clean (the reference's limpiar_ejecucion_previa).
    * Returns true if a previous run was removed.
    */
  def cleanRun(spark: SparkSession, base: String, date: LocalDate): Boolean = {
    val p = new Path(runDir(base, date))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.delete(p, true)
  }
}
