package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables
import graft.operators.{Dedup, MaintainedComponents}

/** Decomposition of q_comp_lifecycle's cost at a given sf dir: which
  * leg carries the wall — constructing the base state (signatures +
  * pairs + closure, which the real standing lifecycle amortizes
  * across its whole life), the store bootstrap (write + bloom
  * sidecars), or the actual maintenance ops (merge/forget) the query
  * exists to price. Usage: runMain graft.tools.CompProbe <sfDir>
  */
object CompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().min(32).toString)
    val spark = Sessions.tuned(SparkSession.builder()
      .master(Sessions.master(cpus.toInt))
      .appName("comp-probe")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val K = 3
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[compprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("compprobe_")
      .toString
    val labelPath = s"$root/labels"
    val sigPath = s"$root/sigs"
    val all = Tables.documents(spark, sfDir)
    val base = all.filter(col("doc_id") % 10 =!= 9)
    val batch = all.filter(col("doc_id") % 10 === 9)
    val baseSigs = time("base signatures") {
      val s = Dedup.minhashSignatures(
        Dedup.docShingles(base, "doc_id", "text", K, dedup = false),
        "doc_id").localCheckpoint()
      s.count(); s
    }
    val basePairs = time("base LSH pairs + jaccard") {
      val p = Dedup.estimatedJaccard(
        Dedup.lshCandidatePairs(baseSigs, "doc_id"), baseSigs, "doc_id")
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
        .localCheckpoint()
      p.count(); p
    }
    val baseLabels = time("base closure") {
      val l = Dedup.connectedComponents(basePairs, base.select("doc_id"),
        "doc_id").localCheckpoint()
      l.count(); l
    }
    time("store bootstrap (write + sigs + blooms)") {
      Dedup.writeSignatures(baseSigs, "doc_id", sigPath)
      MaintainedComponents.write(baseLabels, "doc_id", labelPath)
    }
    val (cross, intra) = time("batch sigs + edges") {
      val storedSigs = Dedup.readSignatures(spark, sigPath)
      val newSigs = Dedup.minhashSignatures(
        Dedup.docShingles(batch, "doc_id", "text", K, dedup = false),
        "doc_id").localCheckpoint()
      val c = Dedup.estimatedJaccardAcross(
        Dedup.lshCrossPairs(newSigs, storedSigs, "doc_id"),
        newSigs, storedSigs, "doc_id")
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
        .localCheckpoint()
      val i = Dedup.estimatedJaccard(
        Dedup.lshCandidatePairs(newSigs, "doc_id"), newSigs, "doc_id")
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
        .localCheckpoint()
      c.count(); i.count()
      Dedup.appendSignatures(newSigs, "doc_id", sigPath)
      (c, i)
    }
    time("MERGE (stored)") {
      MaintainedComponents.merge(spark, labelPath,
        cross.unionByName(intra), batch.select("doc_id"), "doc_id",
        batchId = 1L)
    }
    // read-only decomposition of the forget legs (none of these
    // mutate state, so the timed FORGET below still runs the full op;
    // it re-does these steps warm, so remainder ≈ rewrite + sig
    // delete — the same inference PqProbe used for the ADC legs)
    val delIds = all.filter(col("doc_id") % 17 === 3).select("doc_id")
      .localCheckpoint()
    val touched = time("  forget/probe (labelsFor→components)") {
      val t = MaintainedComponents.labelsFor(spark, labelPath, delIds,
        "doc_id").select("component").distinct().localCheckpoint()
      t.count(); t
    }
    val touchedLabels = time("  forget/membersOf") {
      val m = MaintainedComponents.membersOf(spark, labelPath, touched)
        .localCheckpoint()
      m.count(); m
    }
    val multiSurv = time("  forget/classify survivors") {
      val survC = touchedLabels.join(delIds, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val multi = survC.groupBy(col("component"))
        .agg(count(lit(1L)).as("__n")).filter(col("__n") >= 2)
        .select("component")
      val ms = survC.join(multi, Seq("component"), "left_semi")
        .localCheckpoint()
      println(s"[compprobe]   touched=${touched.count()} members=" +
        s"${touchedLabels.count()} multiSurv=${ms.count()}")
      ms
    }
    val survSigs = time("  forget/sig point-read") {
      val s = Dedup.readSignaturesFor(spark, sigPath,
        multiSurv.select("doc_id"), "doc_id")
        .join(multiSurv, Seq("doc_id")).localCheckpoint()
      s.count(); s
    }
    val pairs = time("  forget/within-component LSH + jaccard") {
      val p = Dedup.estimatedJaccard(
        Dedup.lshCandidatePairsWithin(survSigs, "doc_id", "component"),
        survSigs.drop("component"), "doc_id")
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
        .localCheckpoint()
      p.count(); p
    }
    time("  forget/closure over multi-survivors") {
      Dedup.connectedComponents(pairs, multiSurv.select("doc_id"),
        "doc_id").queryExecution.toRdd.count()
    }
    time("FORGET (stored, incl. sig tombstone)") {
      MaintainedComponents.forget(spark, labelPath, sigPath,
        delIds, "doc_id", batchId = 2L)
    }
    // price the two sig-delete forms against each other: the O(batch)
    // tombstone forget now publishes vs the O(touched-partition)
    // eager rewrite it replaced (a mixed batch touches ALL sig_parts,
    // so this leg rewrites the whole table — the r15 scale argument)
    time("  forget/sig-delete EAGER rewrite (the replaced form)") {
      Dedup.deleteSignatures(spark, sigPath, delIds, "doc_id")
    }
    time("  forget/sig-delete tombstone replay (committed, no-op)") {
      Dedup.deleteSignaturesDeferred(spark, sigPath, delIds, "doc_id",
        batchId = 2L)
    }
    time("read back") {
      MaintainedComponents.read(spark, labelPath).orderBy("doc_id")
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
