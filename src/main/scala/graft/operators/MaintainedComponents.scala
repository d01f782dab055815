package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.io.{PartCommit, SchemaFile}

/** The STORED component-label lifecycle — the disk-resident twin of
  * [[Dedup.mergeComponents]]/[[Dedup.forgetDocs]], which take the
  * previous labeling as an in-memory frame and return a new one (their
  * callers re-materialize the WHOLE table every batch). Between
  * ingests the corpus's near-dup clustering lives as its (id,
  * component) table — ~16 bytes/doc, the cheapest possible standing
  * representation — laid out hash-partitioned on the COMPONENT label:
  *
  *   comp_part = pmod(hash(component), CompParts)
  *
  * Component, not id, because every maintenance op is component-
  * granular: a batch touches the components its edges reach, and with
  * this layout (a) expanding a touched component to its members is a
  * partition-PRUNED read (its comp_part is recomputable from the label
  * alone — static filter, ≤ [[CompParts]] values), and (b) the rewrite
  * replaces ONLY the partitions where touched components live — the
  * untouched 63/64ths of a 100 TB corpus's labels are never read or
  * written. The one access this layout cannot prune is the initial
  * id→label probe (which components does the batch touch?): that is
  * one columnar scan of the label table with a broadcast semi-join —
  * bounded by the table's 16 bytes/doc, never by the corpus — and is
  * the deliberate trade against an id-hashed layout, whose probe would
  * prune but whose rewrite would touch nearly every partition (a
  * component's members hash everywhere by id).
  *
  * Correctness contracts are inherited verbatim:
  *   - merge: CC(star edges ∪ new edges) ≡ CC(old pairs ∪ new pairs)
  *     (star-contraction identity, [[Dedup.mergeComponents]]);
  *   - forget: deletes can SPLIT components, so the repair re-derives
  *     touched components' edges from the maintained SIGNATURE table —
  *     via [[Dedup.readSignaturesFor]], itself a sig_part-pruned point
  *     read — and re-runs the closure over survivors only
  *     ([[Dedup.forgetDocs]]).
  *
  * Both rewrites go through [[graft.io.PartCommit]]: staged touched
  * partitions, atomic commit marker, idempotent per-partition swap —
  * exactly-once under retry, keyed by the caller's batch id, with
  * every entry point recovering a predecessor's crashed commit first.
  * Refresh ≡ full recompute is the oracle (q_comp_lifecycle) and
  * spec-pinned against the in-memory twins.
  */
object MaintainedComponents {

  /** Layout fan-out — same sizing logic as [[graft.io.MaintainedAgg
    * .AggParts]]: the rewrite unit is table/CompParts, and a batch
    * touching k components rewrites ≤ min(k, CompParts) partitions.
    */
  val CompParts = 64

  private def withCompPart(df: DataFrame): DataFrame =
    df.withColumn("comp_part",
      pmod(hash(col("component")), lit(CompParts)).cast("int"))

  /** Materialize a labeling (e.g. [[Dedup.connectedComponents]]
    * output) as the stored table. Columns: (`idCol`, component).
    *
    * On non-atomic-rename backends the table bootstraps GENERATION-
    * ROOTED ([[graft.io.GenTable]]) — a RE-bootstrap over an existing
    * table is a whole-dir overwrite, which on an object store would
    * otherwise give external readers a partial-table window; the gen
    * pointer makes it a zero-gap flip. Every entry point resolves the
    * live generation first, so callers always address the root path.
    */
  def write(labels: DataFrame, idCol: String, path: String): Unit = {
    val spark = labels.sparkSession
    if (graft.io.GenTable.shouldGen(spark, path))
      graft.io.GenTable.swapGen(spark, path)(st =>
        writeFlat(labels, idCol, st))
    else writeFlat(labels, idCol, path)
  }

  private def writeFlat(labels: DataFrame, idCol: String,
                        path: String): Unit = {
    val keyed = withCompPart(labels.select(col(idCol), col("component")))
    keyed.repartition(CompParts, col("comp_part"))
      .write.mode("overwrite").partitionBy("comp_part").parquet(path)
    // out-of-band schema: a forget that empties the table must leave
    // it readable (zero parquet files infer nothing)
    SchemaFile.write(labels.sparkSession, path, keyed.schema)
    // one extra pass over the new table, so the id→label probe can be
    // partition-pruned forever after (bootstrap is once; every
    // merge/forget pays only its touched partitions)
    writeBloomSidecars(labels.sparkSession, path, idCol)
  }

  // ---- per-partition member-id bloom sidecars ----
  //
  // The id→label probe (labelsFor) was this layout's one documented
  // un-prunable access: components hash to partitions by LABEL, so an
  // id could live anywhere and every merge/forget scanned the whole
  // label table once. Each partition dir now carries a `_bloom` file
  // (Spark's util.sketch.BloomFilter over the partition's member ids,
  // `_`-prefixed so data readers never list it): the probe tests the
  // batch ids against 64 small filters and scans only the partitions
  // that CAN contain a batch id. False positives cost an extra
  // partition read; false negatives are impossible for live data —
  // the bloom is built from the exact partition content inside the
  // SAME staged commit that publishes the content (the sidecar rides
  // the partition swap, so no crash window can publish rows without
  // their bloom). A partition without a sidecar (foreign writer) is
  // conservatively treated as a hit.

  private val BloomFpp = 0.01

  private def bloomPath(dir: String, part: Int): Path =
    new Path(dir, s"comp_part=$part/_bloom")

  /** Build and write the `_bloom` sidecar for every `comp_part=N` dir
    * under `dir` (the live table at bootstrap, the STAGED dir during a
    * rewrite — before the commit marker, so data and sidecar publish
    * atomically together).
    *
    * EXECUTOR-SIDE by design (the r14 verdict's scale-killer): the
    * driver never holds a filter. One shuffle routes each row to the
    * task owning its comp_part (identity partitioner — RDD partition
    * index IS the comp_part value), and that task builds ONE filter in
    * memory — sized from its own partition's count, so skewed
    * partitions don't inflate every filter — and streams it straight
    * to the sidecar file through [[graft.io.AtomicIo.publishStream]]
    * (all-or-nothing on both backend worlds; a crashed write can
    * never leave a truncated sidecar for [[labelsFor]] to choke on).
    * Driver memory is the ≤ [[CompParts]]-row count map; peak executor
    * memory is one filter per running task. On a rewrite `dir` is the
    * STAGED tree — touched partitions only — so the shuffle is
    * touched-sized; only the bootstrap pays one corpus-table pass
    * (16 bytes/doc, the cheapest full pass the table admits).
    */
  private def writeBloomSidecars(spark: SparkSession, dir: String,
                                 idCol: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) return
    if (!fs.listStatus(new Path(dir))
      .exists(_.getPath.getName.startsWith("comp_part="))) return
    val rows = spark.read.parquet(dir)
      .select(col("comp_part").cast("int"), col(idCol).cast("string"))
    // partition-column-only scan: no data pages decode — one cheap job
    // sizes each partition's filter from its OWN count
    val counts = spark.read.parquet(dir).groupBy(col("comp_part"))
      .agg(count(lit(1L)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.valuesIterator.sum == 0L) return
    val confB = spark.sparkContext.broadcast(
      new graft.io.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    val (dirStr, fpp) = (dir, BloomFpp)
    rows.rdd
      .map(r => (r.getInt(0), r.getString(1)))
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = CompParts
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .foreachPartition { it =>
        if (it.hasNext) {
          val part = org.apache.spark.TaskContext.getPartitionId()
          val expected = math.max(counts.getOrElse(part, 0L), 64L)
          val bf = BloomFilter.create(expected, fpp)
          it.foreach { case (p, s) =>
            require(p == part, s"partitioner routed part $p to task $part")
            bf.putString(s)
          }
          val taskFs = new Path(dirStr).getFileSystem(confB.value.value)
          graft.io.AtomicIo.publishStream(taskFs,
            new Path(dirStr, s"comp_part=$part/_bloom"))(bf.writeTo)
        }
      }
  }

  /** The full labeling (layout column dropped), crash-recovered. */
  def read(spark: SparkSession, rootPath: String): DataFrame = {
    val path = graft.io.GenTable.live(spark, rootPath)
    PartCommit.recover(spark, path)
    readKeyed(spark, path).drop("comp_part")
  }

  private def readKeyed(spark: SparkSession, path: String): DataFrame =
    SchemaFile.read(spark, path) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None    => spark.read.parquet(path)
    }

  /** id→label probe, bloom-pruned: the batch ids (batch-bounded by
    * contract — the same bound that lets them broadcast) are tested
    * against each partition's `_bloom` sidecar, and only partitions
    * that CAN contain a batch id are scanned + semi-joined. The
    * sidecars stream through the driver one at a time (memory = ids +
    * one filter), so the driver never holds the whole sidecar set. A
    * partition without a sidecar is scanned unconditionally — no
    * false negatives by construction, so the probe result is
    * IDENTICAL to the full scan (spec-pinned), just cheaper: a
    * typical batch touches a handful of components, and the scan
    * drops from the whole table to the hit partitions.
    */
  def labelsFor(spark: SparkSession, rootPath: String, ids: DataFrame,
                idCol: String): DataFrame = {
    val path = graft.io.GenTable.live(spark, rootPath)
    val distinctIds = ids.select(col(idCol)).distinct().localCheckpoint()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs =
      if (!fs.exists(new Path(path))) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(new Path(path))
        .filter(_.getPath.getName.startsWith("comp_part="))
    val keyed = readKeyed(spark, path)
    val probe =
      if (partDirs.isEmpty) keyed
      else {
        val idStrs = distinctIds.select(col(idCol).cast("string"))
          .collect().map(_.getString(0)) // batch-bounded
        val hit = partDirs.flatMap { st =>
          val p = st.getPath.getName.stripPrefix("comp_part=").toInt
          val bp = new Path(st.getPath, "_bloom")
          if (!fs.exists(bp)) Some(p) // no sidecar: conservative hit
          else {
            // an UNREADABLE sidecar (foreign writer's torn file, codec
            // mismatch) degrades to the same conservative hit a missing
            // one gets — the probe must never hard-fail on an
            // optimization artifact
            scala.util.Try {
              val in = fs.open(bp)
              try BloomFilter.readFrom(in) finally in.close()
            }.toOption match {
              case Some(bf) =>
                if (idStrs.exists(bf.mightContainString)) Some(p) else None
              case None => Some(p)
            }
          }
        }.toSeq
        if (hit.isEmpty) keyed.limit(0)
        else keyed.filter(col("comp_part").isin(hit: _*))
      }
    probe.join(broadcast(distinctIds), Seq(idCol), "left_semi")
      .drop("comp_part")
  }

  /** Members of exactly the given components: static comp_part filter
    * (≤ [[CompParts]] distinct ints — bounded driver work) prunes the
    * scan to touched/CompParts of the table, then a broadcast
    * semi-join on (comp_part, component) finishes the exact cut.
    */
  def membersOf(spark: SparkSession, rootPath: String,
                components: DataFrame): DataFrame = {
    val path = graft.io.GenTable.live(spark, rootPath)
    val keyed = withCompPart(components.select("component").distinct())
      .localCheckpoint() // feeds the part list AND the semi-join once
    val parts = keyed.select("comp_part").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (parts.isEmpty)
      return readKeyed(spark, path).limit(0).drop("comp_part")
    readKeyed(spark, path)
      .filter(col("comp_part").isin(parts: _*))
      .join(broadcast(keyed), Seq("comp_part", "component"), "left_semi")
      .drop("comp_part")
  }

  /** Merge a batch's near-dup edges (batch–batch and batch–corpus,
    * either orientation) plus its vertices into the stored labeling.
    * Semantics ≡ [[Dedup.mergeComponents]] over the stored table;
    * cost: one label-table scan (probe) + touched/CompParts read +
    * batch-sized closure + touched-partition rewrite.
    */
  def merge(spark: SparkSession, rootPath: String, newEdges: DataFrame,
            newVertices: DataFrame, idCol: String, batchId: Long): Unit = {
    val path = graft.io.GenTable.live(spark, rootPath)
    PartCommit.recover(spark, path)
    if (batchId <= PartCommit.lastApplied(spark, path)) return
    val edges = newEdges.select(col("id_a"), col("id_b")).localCheckpoint()
    val verts = newVertices.select(col(idCol)).distinct().localCheckpoint()
    val probeIds = edges
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
      .union(verts.select(col(idCol)))
      .distinct()
    // one probe serves the touched set AND the fresh-vertex anti-join
    val probed = labelsFor(spark, path, probeIds, idCol).localCheckpoint()
    val touched = probed.select("component").distinct().localCheckpoint()
    val touchedLabels = membersOf(spark, path, touched).localCheckpoint()
    val starEdges = touchedLabels.filter(col(idCol) =!= col("component"))
      .select(col(idCol).as("id_a"), col("component").as("id_b"))
    val freshVerts = verts.join(probed.select(idCol), Seq(idCol), "left_anti")
    val subVerts = touchedLabels.select(idCol).union(freshVerts).distinct()
    val sub = Dedup.connectedComponents(starEdges.union(edges), subVerts,
      idCol)
    rewrite(spark, path, idCol, batchId, touched, touchedLabels, sub)
  }

  /** Forget documents: drop them from the labeling and repair the
    * components they leave (deletes can SPLIT — the stars are not
    * sufficient evidence, so touched components' edges are re-derived
    * from the maintained signature table at `sigPath`, a
    * sig_part-PRUNED point read). Also removes the ids from the
    * signature table, keeping the two stores consistent — as an
    * O(batch) DEFERRED tombstone ([[Dedup.deleteSignaturesDeferred]]),
    * not the eager rewrite: a mixed forget batch hashes into every
    * sig_part, so the eager path rewrites the whole signature table
    * (O(corpus) at 100 TB); the tombstone is one small file + marker,
    * folded at the next [[Dedup.compactSignatures]].
    *
    * The tombstone publishes BEFORE the label rewrite. Both steps are
    * idempotent under this batchId (marker-keyed and
    * `_applied`-keyed), so a crash anywhere replays to completion —
    * including the window the previous eager ordering left open: with
    * the sig delete LAST, a crash after the label rewrite's apply mark
    * made the replay no-op before ever deleting the signatures, and
    * the forgotten docs' stale signatures could band-join future
    * batches into edges bridging live components through a ghost.
    * Semantics ≡ [[Dedup.forgetDocs]] over the stored tables.
    */
  def forget(spark: SparkSession, rootPath: String, sigPath: String,
             deleteIds: DataFrame, idCol: String, batchId: Long,
             threshold: Double = 0.5): Unit = {
    val path = graft.io.GenTable.live(spark, rootPath)
    PartCommit.recover(spark, path)
    if (batchId <= PartCommit.lastApplied(spark, path)) return
    val del = deleteIds.select(col(idCol)).distinct().localCheckpoint()
    // sig-store tombstone first (survivor reads below anti-join it,
    // and survivors are disjoint from `del` by construction)
    Dedup.deleteSignaturesDeferred(spark, sigPath, del, idCol, batchId)
    val touched = labelsFor(spark, path, del, idCol)
      .select("component").distinct().localCheckpoint()
    val touchedLabels = membersOf(spark, path, touched).localCheckpoint()
    // survivors WITH their old component label: the label both
    // classifies repair work and keys the within-component band join
    val survivorsC = touchedLabels.join(del, Seq(idCol), "left_anti")
      .localCheckpoint()
    // A component with ≤1 survivor cannot split further: its survivor
    // relabels to itself (the closure's min-id convention over a
    // singleton), no signature fetch, no band join, no closure. In a
    // near-dup corpus most clusters are pairs and most touched
    // components land here, so the expensive path below runs over the
    // few MULTI-survivor components only (measured: the r14 verdict's
    // forget-vs-merge gap came almost entirely from banding+closure
    // over survivors that could never split).
    val multiComps = survivorsC.groupBy(col("component"))
      .agg(count(lit(1L)).as("__n")).filter(col("__n") >= 2)
      .select("component")
    val multiSurv = survivorsC.join(multiComps, Seq("component"),
      "left_semi").localCheckpoint()
    val singleLabels = survivorsC.join(multiComps, Seq("component"),
      "left_anti").select(col(idCol), col(idCol).as("component"))
    // survivor signatures: partition-pruned fetch over the MULTI
    // survivors only, materialized once (they feed the band join AND
    // the scoring join — the incrementalDedup caller contract)
    val survSigs = Dedup.readSignaturesFor(spark, sigPath,
        multiSurv.select(idCol), idCol)
      .join(multiSurv, Seq(idCol))
      .localCheckpoint()
    // deletes can only SPLIT components (no new edge appears), so
    // candidate pairs need only be sought WITHIN each old component —
    // exact under the labeling's banded-closure invariant
    // ([[Dedup.lshCandidatePairsWithin]] states the argument)
    val pairs = Dedup.estimatedJaccard(
      Dedup.lshCandidatePairsWithin(survSigs, idCol, "component"),
      survSigs.drop("component"), idCol)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b")
    val repaired = Dedup.connectedComponents(pairs,
      multiSurv.select(idCol), idCol)
    rewrite(spark, path, idCol, batchId, touched, touchedLabels,
      repaired.select(col(idCol), col("component"))
        .unionByName(singleLabels))
  }

  /** Replace the stored rows of `touched` components with `relabeled`
    * (the closure's output over exactly those components' vertices ±
    * batch adds/deletes). Touched partitions = where touched
    * components lived ∪ where relabeled rows land; each keeps its
    * untouched-component rows via a broadcast anti-join carry.
    */
  private def rewrite(spark: SparkSession, path: String, idCol: String,
                      batchId: Long, touched: DataFrame,
                      touchedLabels: DataFrame,
                      relabeled: DataFrame): Unit = {
    val newKeyed = withCompPart(
      relabeled.select(col(idCol), col("component"))).localCheckpoint()
    val oldParts = withCompPart(touched).select("comp_part").distinct()
      .collect().map(_.getInt(0))
    val newParts = newKeyed.select("comp_part").distinct()
      .collect().map(_.getInt(0))
    val parts = (oldParts ++ newParts).distinct.toSeq
    if (parts.isEmpty) {
      PartCommit.markApplied(spark, path, batchId)
      return
    }
    val slice = readKeyed(spark, path)
      .filter(col("comp_part").isin(parts: _*))
    // untouched components sharing a touched partition carry over
    // verbatim; touched components' rows are replaced wholesale
    val carry = slice.join(broadcast(touched), Seq("component"),
      "left_anti")
    val merged = carry.select(col(idCol), col("component"),
      col("comp_part"))
      .unionByName(newKeyed.select(col(idCol), col("component"),
        col("comp_part")))
    PartCommit.replaceParts(spark, path, "comp_part", batchId, parts) {
      stage =>
        merged.repartition(parts.size, col("comp_part"))
          .write.mode("overwrite").partitionBy("comp_part").parquet(stage)
        // sidecars ride the SAME staged commit as the rows they index:
        // the partition swap publishes data+bloom together, so no
        // crash window can expose rows a probe's bloom doesn't know
        writeBloomSidecars(spark, stage, idCol)
    }
  }
}
