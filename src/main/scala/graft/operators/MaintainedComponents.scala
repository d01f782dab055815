package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    */
  def write(labels: DataFrame, idCol: String, path: String): Unit = {
    val keyed = withCompPart(labels.select(col(idCol), col("component")))
    keyed.repartition(CompParts, col("comp_part"))
      .write.mode("overwrite").partitionBy("comp_part").parquet(path)
    // out-of-band schema: a forget that empties the table must leave
    // it readable (zero parquet files infer nothing)
    SchemaFile.write(labels.sparkSession, path, keyed.schema)
  }

  /** The full labeling (layout column dropped), crash-recovered. */
  def read(spark: SparkSession, path: String): DataFrame = {
    PartCommit.recover(spark, path)
    readKeyed(spark, path).drop("comp_part")
  }

  private def readKeyed(spark: SparkSession, path: String): DataFrame =
    SchemaFile.read(spark, path) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None    => spark.read.parquet(path)
    }

  /** id→label probe: ONE scan of the 16-byte/doc table + a broadcast
    * semi-join (`ids` must be batch-bounded — the caller's CDC/forget
    * batch). The un-prunable access of this layout; see the class doc
    * for why that trade is right.
    */
  def labelsFor(spark: SparkSession, path: String, ids: DataFrame,
                idCol: String): DataFrame =
    readKeyed(spark, path)
      .join(broadcast(ids.select(col(idCol)).distinct()),
        Seq(idCol), "left_semi")
      .drop("comp_part")

  /** Members of exactly the given components: static comp_part filter
    * (≤ [[CompParts]] distinct ints — bounded driver work) prunes the
    * scan to touched/CompParts of the table, then a broadcast
    * semi-join on (comp_part, component) finishes the exact cut.
    */
  def membersOf(spark: SparkSession, path: String,
                components: DataFrame): DataFrame = {
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
  def merge(spark: SparkSession, path: String, newEdges: DataFrame,
            newVertices: DataFrame, idCol: String, batchId: Long): Unit = {
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
    * signature table ([[Dedup.deleteSignatures]] — itself a
    * touched-partition rewrite), keeping the two stores consistent.
    * Semantics ≡ [[Dedup.forgetDocs]] over the stored tables.
    */
  def forget(spark: SparkSession, path: String, sigPath: String,
             deleteIds: DataFrame, idCol: String, batchId: Long,
             threshold: Double = 0.5): Unit = {
    PartCommit.recover(spark, path)
    if (batchId <= PartCommit.lastApplied(spark, path)) return
    val del = deleteIds.select(col(idCol)).distinct().localCheckpoint()
    val touched = labelsFor(spark, path, del, idCol)
      .select("component").distinct().localCheckpoint()
    val touchedLabels = membersOf(spark, path, touched).localCheckpoint()
    val survivors = touchedLabels.select(idCol)
      .join(del, Seq(idCol), "left_anti")
    // survivor signatures: partition-pruned fetch, materialized once
    // (they feed the band join AND the scoring join — the
    // incrementalDedup caller contract)
    val survSigs = Dedup.readSignaturesFor(spark, sigPath, survivors, idCol)
      .localCheckpoint()
    val pairs = Dedup.estimatedJaccard(
      Dedup.lshCandidatePairs(survSigs, idCol), survSigs, idCol)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b")
    val repaired = Dedup.connectedComponents(pairs,
      survivors.localCheckpoint(), idCol)
    rewrite(spark, path, idCol, batchId, touched, touchedLabels, repaired)
    Dedup.deleteSignatures(spark, sigPath, del, idCol)
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
    }
  }
}
