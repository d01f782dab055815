package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables
import graft.operators.Similarity

/** One-off decomposition of q_pq_lifecycle's cost at a given sf dir:
  * codebook, write (half corpus), append (other half), query. Usage:
  * runMain graft.tools.PqProbe <sfDir>
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().min(32).toString)
    val spark = Sessions.tuned(SparkSession.builder()
      .master(Sessions.master(cpus.toInt))
      .appName("pq-probe")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val NumSeeds = 10; val PqSub = 8; val PqSubDim = 8; val PqCodes = 16
    val K = 3
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.embeddings(spark, sfDir)
    val cent = e.filter(col("vec_id") < NumSeeds)
      .select(col("vec_id").as("cluster"),
        col("embedding").cast("array<double>").as("cv"))
    val cb = time("codebook") {
      val c = Similarity.pqSeedCodebook(e, "vec_id", "embedding",
        PqSub, PqSubDim, PqCodes).localCheckpoint()
      c.count(); c
    }
    val path = java.nio.file.Files.createTempDirectory("pqprobe_")
      .toString + "/idx"
    time("write (half corpus)") {
      Similarity.writePqIndex(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", cent, cb, PqSub, PqSubDim, path)
    }
    time("append (other half)") {
      Similarity.appendPqIndex(e.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", path)
    }
    val queries = e.filter(expr("vec_id % 50 = 0"))
    time("query (stored index)") {
      Similarity.queryPqIndex(spark, path, queries,
        "vec_id", "embedding", K)
        .orderBy("query_id", "rank")
        .queryExecution.toRdd.count()
    }
    // second query run: page-cache-warm, the steady-state serve cost
    time("query (warm)") {
      Similarity.queryPqIndex(spark, path, queries,
        "vec_id", "embedding", K)
        .orderBy("query_id", "rank")
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
