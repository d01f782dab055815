package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** The stored component-label lifecycle: merge/forget over the
  * parquet-resident labeling must be INDISTINGUISHABLE from the
  * in-memory twins (mergeComponents/forgetDocs) and from the full
  * closure over the final corpus — plus the layout claims measured:
  * member expansion partition-prunes, untouched partitions' files
  * survive a merge byte-identical, and batch-id replay no-ops.
  */
class MaintainedComponentsSpec extends SparkSpec {

  private val K = 3

  private def sigsOf(docs: DataFrame): DataFrame =
    Dedup.minhashSignatures(
      Dedup.docShingles(docs, "doc_id", "text", K, dedup = false),
      "doc_id")

  private def pairsOf(sigs: DataFrame): DataFrame =
    Dedup.estimatedJaccard(
      Dedup.lshCandidatePairs(sigs, "doc_id"), sigs, "doc_id")
      .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")

  private def tmp(n: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_mc_$n").toString + "/t"

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stored merge ≡ in-memory mergeComponents ≡ full closure") {
    val all = Tables.documents(spark, sf)
    val base = all.filter(col("doc_id") % 10 =!= 9)
    val batch = all.filter(col("doc_id") % 10 === 9)
    val baseSigs = sigsOf(base).localCheckpoint()
    val baseLabels = Dedup.connectedComponents(pairsOf(baseSigs),
      base.select("doc_id"), "doc_id").localCheckpoint()
    val path = tmp("merge")
    MaintainedComponents.write(baseLabels, "doc_id", path)
    val newSigs = sigsOf(batch).localCheckpoint()
    val cross = Dedup.estimatedJaccardAcross(
      Dedup.lshCrossPairs(newSigs, baseSigs, "doc_id"),
      newSigs, baseSigs, "doc_id")
      .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
    val intra = pairsOf(newSigs)
    val edges = cross.unionByName(intra).localCheckpoint()
    MaintainedComponents.merge(spark, path, edges,
      batch.select("doc_id"), "doc_id", batchId = 1L)
    val stored = labelMap(MaintainedComponents.read(spark, path))
    val inMem = labelMap(Dedup.mergeComponents(baseLabels, edges,
      batch.select("doc_id"), "doc_id"))
    val full = labelMap(Dedup.connectedComponents(
      pairsOf(sigsOf(all).localCheckpoint()),
      all.select("doc_id"), "doc_id"))
    assert(stored.nonEmpty && stored == inMem,
      "stored merge diverged from the in-memory twin")
    assert(stored == full, "stored merge diverged from the full closure")
    // replay of batch 1 no-ops
    MaintainedComponents.merge(spark, path, edges,
      batch.select("doc_id"), "doc_id", batchId = 1L)
    assert(labelMap(MaintainedComponents.read(spark, path)) == stored)
  }

  test("stored forget ≡ in-memory forgetDocs ≡ closure over survivors") {
    val all = Tables.documents(spark, sf)
    val sigs = sigsOf(all).localCheckpoint()
    val labels = Dedup.connectedComponents(pairsOf(sigs),
      all.select("doc_id"), "doc_id").localCheckpoint()
    val path = tmp("forget")
    val sigPath = tmp("forgetsigs")
    MaintainedComponents.write(labels, "doc_id", path)
    Dedup.writeSignatures(sigs, "doc_id", sigPath)
    val del = all.filter(col("doc_id") % 17 === 3).select("doc_id")
      .localCheckpoint()
    MaintainedComponents.forget(spark, path, sigPath, del, "doc_id",
      batchId = 1L)
    val stored = labelMap(MaintainedComponents.read(spark, path))
    val inMem = labelMap(Dedup.forgetDocs(labels, sigs, del, "doc_id"))
    val surv = all.filter(col("doc_id") % 17 =!= 3)
    val full = labelMap(Dedup.connectedComponents(
      pairsOf(sigsOf(surv).localCheckpoint()),
      surv.select("doc_id"), "doc_id"))
    assert(stored.nonEmpty && stored == inMem,
      "stored forget diverged from the in-memory twin")
    assert(stored == full,
      "stored forget diverged from the survivors' closure")
    // the signature table shrank in lockstep
    val sigIds = Dedup.readSignatures(spark, sigPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigIds == stored.keySet,
      "signature table out of sync with the labeling")
  }

  test("member expansion prunes partitions; merge leaves untouched files alone") {
    val all = Tables.documents(spark, sf)
    val sigs = sigsOf(all).localCheckpoint()
    val labels = Dedup.connectedComponents(pairsOf(sigs),
      all.select("doc_id"), "doc_id").localCheckpoint()
    val path = tmp("prune")
    MaintainedComponents.write(labels, "doc_id", path)
    val total = spark.read.parquet(path).count()
    // one touched component: expansion must read a bounded slice
    val oneComp = labels.select("component").orderBy("component").limit(1)
    val expansion = MaintainedComponents.membersOf(spark, path, oneComp)
    val read = graft.plans.ScanAudit.measure(expansion).rowsRead
    assert(read < total / 2,
      s"one-component expansion scanned $read of $total label rows")
    val plan = expansion.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("comp_part"),
      s"comp_part must prune at the partition level:\n$plan")
    // a one-edge merge rewrites only the partitions it touches
    val ids = all.select("doc_id").orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0))
    import spark.implicits._
    val edge = Seq((ids(0), ids(1))).toDF("id_a", "id_b")
    val touchedComps = MaintainedComponents.labelsFor(spark, path,
      edge.select(col("id_a").as("doc_id"))
        .union(edge.select(col("id_b").as("doc_id"))), "doc_id")
      .select("component")
    val touchedParts = touchedComps
      .select(pmod(hash(col("component")),
        lit(MaintainedComponents.CompParts)).cast("int").as("p"))
      .distinct().collect().map(_.getInt(0)).toSet
    // the merged component's label is the min of the two touched
    // components' labels (components are min-member ids), so every
    // partition the merge can write already sits in touchedParts
    val before = untouchedFiles(path, touchedParts)
    MaintainedComponents.merge(spark, path, edge,
      edge.select(col("id_a").as("doc_id")), "doc_id", batchId = 1L)
    assert(untouchedFiles(path, touchedParts) == before,
      "untouched comp_part partitions must not be rewritten")
  }

  test("bloom sidecars prune the id→label probe; result ≡ full-scan probe") {
    val all = Tables.documents(spark, sf)
    val sigs = sigsOf(all).localCheckpoint()
    val labels = Dedup.connectedComponents(pairsOf(sigs),
      all.select("doc_id"), "doc_id").localCheckpoint()
    val path = tmp("bloom")
    MaintainedComponents.write(labels, "doc_id", path)
    // every partition dir carries its sidecar after a bootstrap write
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("comp_part="))
    assert(partDirs.nonEmpty && partDirs.forall(d =>
      fs.exists(new org.apache.hadoop.fs.Path(d.getPath, "_bloom"))),
      "every partition must carry a _bloom sidecar")
    // a SKEWED batch — ids from one component — must read fewer label
    // rows than the table (the r13 verdict's measured-pruning ask);
    // with ~1% fpp over this fixture the hit set is a handful of
    // partitions, not all of them
    import spark.implicits._
    val oneComp = labels.orderBy("component", "doc_id").limit(1)
      .select("component")
    val batchIds = MaintainedComponents.membersOf(spark, path, oneComp)
      .select("doc_id").localCheckpoint()
    val total = spark.read.parquet(path).count()
    val probe = MaintainedComponents.labelsFor(spark, path, batchIds,
      "doc_id")
    val read = graft.plans.ScanAudit.measureFor(probe, "comp_part").rowsRead
    assert(read < total / 2,
      s"bloom-pruned probe scanned $read of $total label rows")
    // pruning must be a semantic no-op: same rows as the full table
    // restricted to the batch ids
    val viaProbe = labelMap(probe)
    val viaFull = labelMap(MaintainedComponents.read(spark, path)
      .join(batchIds, "doc_id"))
    assert(viaProbe == viaFull && viaProbe.nonEmpty,
      "bloom pruning changed the probe result")
    // after a merge, rewritten partitions carry FRESH sidecars that
    // know the new ids (no false negatives for post-merge probes)
    val newId = all.agg(max(col("doc_id"))).head().getLong(0) + 1000L
    val anchor = batchIds.orderBy("doc_id").limit(1)
      .collect().head.getLong(0)
    MaintainedComponents.merge(spark, path,
      Seq((newId, anchor)).toDF("id_a", "id_b"),
      Seq(newId).toDF("doc_id"), "doc_id", batchId = 1L)
    val afterProbe = labelMap(MaintainedComponents.labelsFor(spark, path,
      Seq(newId).toDF("doc_id"), "doc_id"))
    assert(afterProbe.keySet == Set(newId),
      s"post-merge probe missed the new id: $afterProbe")
  }

  test("merge bootstraps an EMPTY stored table") {
    import spark.implicits._
    val path = tmp("boot")
    MaintainedComponents.write(
      Seq.empty[(Long, Long)].toDF("doc_id", "component"), "doc_id", path)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val verts = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    MaintainedComponents.merge(spark, path, edges, verts, "doc_id", 1L)
    val got = labelMap(MaintainedComponents.read(spark, path))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L), got)
  }


  private def untouchedFiles(path: String,
                             touched: Set[Int]): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isDirectory)
      .filter(d => d.getPath.getName.startsWith("comp_part=") &&
        !touched.contains(
          d.getPath.getName.stripPrefix("comp_part=").toInt))
      .flatMap(d => fs.listStatus(d.getPath).map(f =>
        f.getPath.toString + ":" + f.getModificationTime + ":" + f.getLen))
      .toSet
  }
}
