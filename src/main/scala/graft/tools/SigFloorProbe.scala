package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.functions.Portable
import graft.operators.Dedup

/** Floor probe for the minhash signature build: how much of the leg
  * is the md5 itself (oracle-pinned, irreducible) vs the
  * explode+groupBy machinery a per-row expression could remove.
  * Usage: runMain graft.tools.SigFloorProbe <sfDir>
  */
object SigFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().min(32).toString)
    val spark = Sessions.tuned(SparkSession.builder()
      .master(Sessions.master(cpus.toInt))
      .appName("sig-floor-probe")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[floor] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = graft.model.Tables.documents(spark, sfDir)
    time("tokenize-only (sum of sizes)") {
      val n = d.select(Portable.tokens(col("text")).as("t"))
        .selectExpr("sum(greatest(size(t)-2,0)) AS shingles",
          "count(1) AS docs").collect()(0)
      println(s"[floor]   docs=${n.getLong(1)} shingles=${n.getLong(0)}")
    }
    val sh = Dedup.docShingles(d, "doc_id", "text", 3, dedup = false)
    time("explode + md5-only (no groupBy)") {
      sh.select(Portable.hash32(col("shingle")).cast("long").as("h"))
        .agg(sum("h")).collect()
    }
    time("full minhash (explode + groupBy 16 mins)") {
      Dedup.minhashSignatures(sh, "doc_id").queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
