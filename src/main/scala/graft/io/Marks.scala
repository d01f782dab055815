package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny long-valued marker files for table-maintenance protocols (the
  * `_folded` high-water marks of merge-on-read views). Reads return
  * -1 when absent; writes go through tmp + rename so a crash mid-write
  * can never leave an unparseable mark (the [[PartCommit]] `_applied`
  * discipline).
  */
object Marks {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readLong(spark: SparkSession, dir: String, name: String): Long = {
    val p = new Path(dir, name)
    val fs = fsOf(spark, dir)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  def writeLong(spark: SparkSession, dir: String, name: String,
                value: Long): Unit =
    // all-or-nothing publication per backend (tmp+rename vs atomic
    // PUT) — the [[AtomicIo]] seam
    AtomicIo.publishFile(fsOf(spark, dir), new Path(dir, name),
      value.toString.getBytes("UTF-8"))
}
