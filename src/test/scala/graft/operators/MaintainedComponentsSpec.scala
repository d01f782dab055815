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

  test("bloom sidecar build is executor-side: no task ships a filter " +
      "to the driver") {
    // the r14 verdict's scale-killer: the old build aggregateByKey'd
    // whole filters and collect()ed them — at 10¹⁰ ids that is ~23 GB
    // of task results on the driver. The rework builds and WRITES each
    // sidecar inside its own task, so the only things crossing the
    // driver boundary are the ≤ CompParts-row count map and empty
    // foreach results. Proof by measurement: a labeling big enough
    // that each filter serializes ≥ ~90 KB, while NO task of the whole
    // bootstrap returns more than 40 KB to the driver.
    import spark.implicits._
    val labels = spark.range(300000L)
      .select(col("id").as("doc_id"), (col("id") % 4).as("component"))
    val path = tmp("execside")
    val maxResult = new java.util.concurrent.atomic.AtomicLong(0L)
    val ended = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        ended.incrementAndGet()
        Option(e.taskMetrics).foreach { m =>
          maxResult.getAndAccumulate(m.resultSize, math.max)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MaintainedComponents.write(labels, "doc_id", path)
      // listener bus is async: wait until task-end events stop arriving
      var last = -1L
      var spins = 0
      while (ended.get() != last && spins < 100) {
        last = ended.get(); spins += 1; Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // sanity: the filters really are bigger than the bound we assert —
    // each partition holds 75k ids, ~90 KB serialized at 1% fpp
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecars = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("comp_part="))
      .map(d => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(d.getPath, "_bloom")).getLen)
    // components can collide into one comp_part (hash % 64), so the
    // dir count is ≤ 4 — what matters is every filter is large
    assert(sidecars.length >= 2 && sidecars.forall(_ > 40000L),
      s"fixture too small to be probative: ${sidecars.toSeq}")
    assert(ended.get() > 0, "listener saw no tasks")
    assert(maxResult.get() < 40000L,
      s"a task returned ${maxResult.get()} bytes to the driver — " +
        "filter-sized results mean the build is not executor-side")
    // and the executor-built sidecars actually work: a probe for ids
    // of one component prunes to its partition and matches a full scan
    val ids = Seq(8L, 12L).toDF("doc_id") // component 0
    val probe = MaintainedComponents.labelsFor(spark, path, ids, "doc_id")
    assert(labelMap(probe) == Map(8L -> 0L, 12L -> 0L))
    val read = graft.plans.ScanAudit.measureFor(probe, "comp_part").rowsRead
    // component 0's part may host one colliding sibling — still a
    // strict subset of the table
    assert(read <= 150000L, s"probe scanned $read rows of 300000")
  }

  test("forget repair branches: multi-survivor components keep their " +
      "closure, single-survivor components bypass to self-labels") {
    import spark.implicits._
    // component {1,2,3,4}: four identical texts (pairwise est = 1.0);
    // component {10,11}: two identical texts; 20: a singleton
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten eleven"
    val t3 = "lorem ipsum dolor sit amet consectetur adipiscing elit sed"
    val docs = Seq(1L -> t1, 2L -> t1, 3L -> t1, 4L -> t1,
      10L -> t2, 11L -> t2, 20L -> t3).toDF("doc_id", "text")
    val sigs = sigsOf(docs).localCheckpoint()
    val labels = Dedup.connectedComponents(pairsOf(sigs),
      docs.select("doc_id"), "doc_id")
    val path = tmp("branches")
    val sigPath = tmp("branchsigs")
    MaintainedComponents.write(labels, "doc_id", path)
    Dedup.writeSignatures(sigs, "doc_id", sigPath)
    // delete 1 (comp 1 keeps 3 survivors → the banding+closure branch)
    // and 10 (comp 10 keeps 1 survivor → the bypass branch)
    MaintainedComponents.forget(spark, path, sigPath,
      Seq(1L, 10L).toDF("doc_id"), "doc_id", batchId = 1L)
    val got = labelMap(MaintainedComponents.read(spark, path))
    assert(got == Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 11L -> 11L,
      20L -> 20L), got)
  }

  test("maintenance is O(batch): merge+forget write NO base partition " +
      "files; compactLabels folds the overlays to the identical labeling") {
    val all = Tables.documents(spark, sf)
    val base = all.filter(col("doc_id") % 10 =!= 9)
    val batch = all.filter(col("doc_id") % 10 === 9)
    val baseSigs = sigsOf(base).localCheckpoint()
    val path = tmp("overlay")
    val sigPath = tmp("overlaysigs")
    MaintainedComponents.write(Dedup.connectedComponents(
      pairsOf(baseSigs), base.select("doc_id"), "doc_id"), "doc_id", path)
    Dedup.writeSignatures(baseSigs, "doc_id", sigPath)
    val newSigs = sigsOf(batch).localCheckpoint()
    val cross = Dedup.estimatedJaccardAcross(
      Dedup.lshCrossPairs(newSigs, baseSigs, "doc_id"),
      newSigs, baseSigs, "doc_id")
      .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
    val edges = cross.unionByName(pairsOf(newSigs)).localCheckpoint()
    Dedup.appendSignatures(newSigs, "doc_id", sigPath)
    // snapshot EVERY base partition file, then run both maintenance ops
    val before = untouchedFiles(path, Set.empty)
    MaintainedComponents.merge(spark, path, edges,
      batch.select("doc_id"), "doc_id", batchId = 1L)
    MaintainedComponents.forget(spark, path, sigPath,
      all.filter(col("doc_id") % 17 === 3).select("doc_id"), "doc_id",
      batchId = 2L)
    assert(untouchedFiles(path, Set.empty) == before,
      "overlay maintenance must not rewrite ANY base partition file")
    // ground truth: full closure over the post-maintenance corpus
    // (merge added the held-out tenth, forget removed the %17 slice)
    val surv = all.filter(col("doc_id") % 17 =!= 3)
    val full = labelMap(Dedup.connectedComponents(
      pairsOf(sigsOf(surv).localCheckpoint()),
      surv.select("doc_id"), "doc_id"))
    val viaOverlays = labelMap(MaintainedComponents.read(spark, path))
    assert(viaOverlays == full,
      "merge-on-read state diverged from the survivors' closure")
    // fold: identical labeling, overlays gone, replay gate survives
    MaintainedComponents.compactLabels(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = graft.io.GenTable.live(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live, "_relabels")),
      "compactLabels must clear the folded overlays")
    assert(labelMap(MaintainedComponents.read(spark, path)) == full,
      "compaction changed the labeling")
    // every partition of the folded base carries a fresh bloom sidecar
    val partDirs = fs.listStatus(new org.apache.hadoop.fs.Path(live))
      .filter(_.getPath.getName.startsWith("comp_part="))
    assert(partDirs.nonEmpty && partDirs.forall(d =>
      fs.exists(new org.apache.hadoop.fs.Path(d.getPath, "_bloom"))),
      "folded base must carry rebuilt _bloom sidecars")
    // applied mark survived the fold: replaying batch 2 no-ops
    MaintainedComponents.forget(spark, path, sigPath,
      all.filter(col("doc_id") % 17 === 3).select("doc_id"), "doc_id",
      batchId = 2L)
    assert(labelMap(MaintainedComponents.read(spark, path)) == full,
      "replay of a folded batch must no-op")
  }

  test("auto-compaction folds relabel overlays at the pending-batch bound") {
    import spark.implicits._
    val path = tmp("autocompact")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pendingOverlays(): Int = {
      val d = new org.apache.hadoop.fs.Path(
        graft.io.GenTable.live(spark, path), "_relabels")
      if (!fs.exists(d)) 0 else fs.listStatus(d).count(_.isDirectory)
    }
    MaintainedComponents.write(
      Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
        .toDF("doc_id", "component"), "doc_id", path)
    spark.conf.set("spark.graft.autoCompactPendingBatches", "2")
    try {
      // below the bound: the overlay stays pending (no premature fold)
      MaintainedComponents.merge(spark, path,
        Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq(1L, 2L).toDF("doc_id"), "doc_id", batchId = 1L)
      assert(pendingOverlays() == 1,
        "one batch below the bound must stay a pending overlay")
      // at the bound: merge itself folds — no caller discipline needed
      MaintainedComponents.merge(spark, path,
        Seq((3L, 4L)).toDF("id_a", "id_b"),
        Seq(3L, 4L).toDF("doc_id"), "doc_id", batchId = 2L)
      assert(pendingOverlays() == 0,
        "reaching the bound must auto-fold the overlays")
      // folded state ≡ the merged labeling, sidecars rebuilt
      assert(labelMap(MaintainedComponents.read(spark, path)) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      val live = graft.io.GenTable.live(spark, path)
      val partDirs = fs.listStatus(new org.apache.hadoop.fs.Path(live))
        .filter(_.getPath.getName.startsWith("comp_part="))
      assert(partDirs.nonEmpty && partDirs.forall(d =>
        fs.exists(new org.apache.hadoop.fs.Path(d.getPath, "_bloom"))),
        "auto-fold must rebuild the _bloom sidecars")
      // replay of a folded batch still no-ops (applied mark survived)
      MaintainedComponents.merge(spark, path,
        Seq((3L, 4L)).toDF("id_a", "id_b"),
        Seq(3L, 4L).toDF("doc_id"), "doc_id", batchId = 2L)
      assert(labelMap(MaintainedComponents.read(spark, path)) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    } finally spark.conf.unset("spark.graft.autoCompactPendingBatches")
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
