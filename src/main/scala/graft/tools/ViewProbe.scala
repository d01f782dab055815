package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables

/** Decomposition of the maintained-VIEW lifecycle queries' cost
  * (q_incr_quantile / q_incr_distinct / q_incr_minmax /
  * q_incr_joinagg): per phase (bootstrap write, CDC refresh, serve),
  * wall seconds AND the number of Spark JOBS the phase launched — the
  * r15 verdict's hypothesis is that at sf0.1 these queries are
  * job-count-bound (each localCheckpoint / isEmpty / collect is one
  * scheduling round trip), not data-bound, and a fusion either proves
  * or disproves it. Usage: runMain graft.tools.ViewProbe <sfDir>
  */
object ViewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().min(32).toString)
    val spark = Sessions.tuned(SparkSession.builder()
      .master(Sessions.master(cpus.toInt))
      .appName("view-probe")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val out = scala.collection.mutable.LinkedHashMap[String, (Double, Int)]()
    def phase[A](label: String)(f: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat before reading
      Thread.sleep(300)
      val nj = jobs.get() - j0
      out(label) = (dt, nj)
      System.err.println(f"[viewprobe] $label: $dt%.2f s, $nj jobs")
      r
    }

    val root = java.nio.file.Files.createTempDirectory("viewprobe_")
      .toString

    // ---- q_incr_quantile, phase-split (mirrors SketchQueries) ----
    {
      import graft.operators.{MaintainedSample, Sketches}
      val QsM = 64
      val li = Tables.lineitem(spark, sfDir)
      def rows(f: DataFrame): DataFrame = f
        .join(broadcast(Tables.supplier(spark, sfDir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nk"), col("k"), col("v"))
      def keyed(f: DataFrame): DataFrame = f.withColumn("k",
        concat_ws("-", col("l_orderkey"), col("l_linenumber")))
      val path = s"$root/quant"
      val oldF = keyed(li.filter(col("l_orderkey") % 13 =!= 0))
        .withColumn("v", col("l_extendedprice"))
      phase("quantile_bootstrap") {
        MaintainedSample.write(rows(oldF), "nk", "k", "v", path, QsM)
      }
      val removed = rows(oldF.filter(
        col("l_orderkey") % 7 === 0 || col("l_orderkey") % 11 === 0))
      val added = rows(oldF
          .filter(col("l_orderkey") % 7 === 0 &&
            col("l_orderkey") % 11 =!= 0)
          .withColumn("v", col("l_extendedprice") + 1.0))
        .unionByName(rows(keyed(li.filter(col("l_orderkey") % 13 === 0))
          .withColumn("v", col("l_extendedprice"))))
      val newRows = rows(keyed(li.filter(col("l_orderkey") % 11 =!= 0 ||
          col("l_orderkey") % 13 === 0))
        .withColumn("v",
          when(col("l_orderkey") % 7 === 0 &&
              col("l_orderkey") % 11 =!= 0 &&
              col("l_orderkey") % 13 =!= 0,
            col("l_extendedprice") + 1.0)
            .otherwise(col("l_extendedprice"))))
      phase("quantile_refresh") {
        MaintainedSample.deltaRefresh(spark, path, removed, added,
          "nk", "k", "v", QsM, batchId = 1L) { dirty =>
          newRows.join(broadcast(dirty), Seq("nk"), "left_semi")
        }
      }
      phase("quantile_serve") {
        val sk = MaintainedSample.read(spark, path)
        val ns = sk.groupBy("nk").agg(count(lit(1)).as("n_sample"))
        ns.join(Sketches.sketchQuantiles(sk, "nk"), "nk")
          .select("nk", "n_sample", "est_p50", "est_p90", "est_p99")
          .orderBy("nk")
          .queryExecution.toRdd.count()
      }
    }

    // ---- q_incr_distinct, phase-split (mirrors SketchQueries) ----
    {
      import graft.operators.MaintainedDistinct
      val li = Tables.lineitem(spark, sfDir)
      def rows(f: DataFrame): DataFrame = f
        .join(broadcast(Tables.supplier(spark, sfDir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nk"), col("k"))
      val path = s"$root/dist"
      val oldRows = rows(li.filter(col("l_orderkey") % 13 =!= 0)
        .withColumn("k", col("l_partkey").cast("string")))
      phase("distinct_bootstrap") {
        MaintainedDistinct.write(oldRows, Seq("nk"), "k", path)
      }
      val removed = rows(li.filter(col("l_orderkey") % 13 =!= 0)
        .filter(col("l_orderkey") % 7 === 0 || col("l_orderkey") % 11 === 0)
        .withColumn("k", col("l_partkey").cast("string")))
      val added = rows(li.filter(col("l_orderkey") % 13 =!= 0)
          .filter(col("l_orderkey") % 7 === 0 && col("l_orderkey") % 11 =!= 0)
          .withColumn("k", (col("l_partkey") + 5000000L).cast("string")))
        .unionByName(rows(li.filter(col("l_orderkey") % 13 === 0)
          .withColumn("k", col("l_partkey").cast("string"))))
      val newRows = rows(li.filter(col("l_orderkey") % 11 =!= 0 ||
          col("l_orderkey") % 13 === 0)
        .withColumn("k",
          when(col("l_orderkey") % 7 === 0 &&
              col("l_orderkey") % 11 =!= 0 &&
              col("l_orderkey") % 13 =!= 0,
            col("l_partkey") + 5000000L)
            .otherwise(col("l_partkey")).cast("string")))
      phase("distinct_refresh") {
        MaintainedDistinct.deltaRefresh(spark, path, removed, added,
          Seq("nk"), "k", batchId = 1L) { dirty =>
          newRows.join(broadcast(dirty), Seq("nk"), "left_semi")
        }
      }
      phase("distinct_serve") {
        MaintainedDistinct.readEstimates(spark, path, Seq("nk"))
          .orderBy("nk").queryExecution.toRdd.count()
      }
    }

    val json = out.map { case (k, (t, j)) =>
      "\"" + k + "\":{\"sec\":" +
        "%.3f".formatLocal(java.util.Locale.ROOT, t) +
        ",\"jobs\":" + j + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"view_probe","sf":"$sfDir","phases":$json}""")
    spark.stop()
  }
}
