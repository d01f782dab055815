package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned table log: manifest-listed parquet snapshots with
  * time travel and vacuum — the single-writer slice of what
  * Delta/Iceberg give a lakehouse, built from the two primitives HDFS/
  * S3A actually guarantee (task-side file immutability + atomic
  * manifest RENAME).
  *
  * Layout: `path/data/b<batch>/part-*.parquet` (immutable once
  * committed — batches are never rewritten) and
  * `path/_manifests/v<version>.json`, each manifest listing the FULL
  * file set of its snapshot. Commits write data to a NEW batch
  * directory, then publish by renaming a temp manifest into place —
  * readers resolve the latest manifest first, so they see the previous
  * snapshot until the rename lands and never a half-written one
  * (snapshot isolation; the zero-gap contract [[StagedSwap]]
  * documents as out of its reach).
  *
  * - append commits carry the previous manifest's files forward, so
  *   unchanged data is SHARED between versions (no rewrite);
  * - overwrite commits list only the new batch, leaving old batches on
  *   disk for time travel;
  * - [[vacuum]] deletes files unreferenced by the kept manifests.
  *
  * Single-writer by contract (like every maintenance op here);
  * concurrent writers need a real table format's conditional commit.
  * Scale: manifests hold file PATHS (thousands of entries at 100 TB
  * with sanely-sized files) — the O(files) driver cost every
  * manifest-based format pays, far below a listing of the data itself.
  */
object Versioned {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_manifests")

  /** Versions present, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val dir = manifestDir(path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  private def manifestFiles(spark: SparkSession, path: String,
                            version: Long): Seq[String] = {
    val f = fs(spark, path)
    val p = new Path(manifestDir(path), f"v$version%05d.json")
    val in = f.open(p)
    val json = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
    // manifest schema is ours and flat — a full JSON parser would be
    // the only use of one in the engine; extract the files array
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(json).map(_.group(1)).toSeq
  }

  /** Transaction ids already committed (for idempotent re-commits). */
  def committedTxns(spark: SparkSession, path: String): Set[String] = {
    val f = fs(spark, path)
    versions(spark, path).flatMap { v =>
      val p = new Path(manifestDir(path), f"v$v%05d.json")
      val in = f.open(p)
      val head = try {
        val chunk = new Array[Byte](512) // txn field leads the manifest
        val n = in.read(chunk)
        new String(chunk, 0, n.max(0), "UTF-8")
      } finally in.close()
      "\"txn\":\"([^\"]*)\"".r.findFirstMatchIn(head).map(_.group(1))
    }.toSet
  }

  /** Commit `df` as the next version. `mode` is `overwrite` (snapshot
    * = this data only) or `append` (snapshot = previous + this).
    * Returns the committed version.
    *
    * `txn`: optional idempotence token. A commit whose token already
    * appears in a published manifest is SKIPPED (returns the current
    * latest version) — the contract that makes a replayed streaming
    * micro-batch (foreachBatch re-delivery after restart) commit
    * exactly once.
    */
  def commit(spark: SparkSession, path: String, df: DataFrame,
             mode: String = "overwrite",
             txn: Option[String] = None): Long = {
    require(mode == "overwrite" || mode == "append", s"bad mode $mode")
    require(txn.forall(t => !t.contains("\"")), "txn token must be quote-free")
    val f = fs(spark, path)
    if (txn.exists(committedTxns(spark, path).contains))
      versions(spark, path).last // replay: already durable, skip
    else commitNew(spark, path, df, mode, txn, f)
  }

  private def commitNew(spark: SparkSession, path: String, df: DataFrame,
                        mode: String, txn: Option[String],
                        f: org.apache.hadoop.fs.FileSystem): Long = {
    val existing = versions(spark, path)
    val next = existing.lastOption.fold(0L)(_ + 1L)
    val batchDir = new Path(path, s"data/b$next")
    // crash safety without a stalled-writer window: the parquet write
    // goes to a PRIVATE uniquely-named temp dir, then renames into the
    // b<next> slot. A writer that died mid-write leaves only its temp
    // dir (vacuum sweeps those); one that died between rename and
    // manifest publish leaves an orphaned b<next> that NO manifest
    // references (manifests list only batches <= their version, and
    // v<next> does not exist — that is why `next` was chosen), which
    // the replayed commit clears. A merely STALLED writer still
    // mid-write can never collide with the retry's files (its dir is
    // private); the race is narrowed to the instant between its rename
    // and the retry's orphan check — the single-writer contract this
    // module already declares covers that metadata-level window.
    val tmpDir = new Path(path,
      s"data/.b$next.tmp-${java.util.UUID.randomUUID().toString}")
    df.write.mode("errorifexists").parquet(tmpDir.toString)
    if (f.exists(batchDir)) f.delete(batchDir, true) // unpublished orphan
    require(f.rename(tmpDir, batchDir),
      s"batch publish rename failed for b$next")
    val newFiles = f.listStatus(batchDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    val carried =
      if (mode == "append" && existing.nonEmpty)
        manifestFiles(spark, path, existing.last)
      else Seq.empty
    val all = carried ++ newFiles
    val txnField = txn.fold("")(t => s""""txn":"$t",""")
    // snapshot schema: an APPEND's snapshot is carried + new files, so
    // its schema is the UNION of the previous version's schema and the
    // batch's — an appended column widens the snapshot (old files
    // null-fill on read), a column the batch omits keeps existing
    // (batch files null-fill). Same-name fields must agree on type:
    // silently coercing would corrupt either side. Overwrites snapshot
    // exactly the batch schema.
    val snapshotSchema =
      if (mode == "append" && existing.nonEmpty)
        manifestSchema(spark, path, existing.last) match {
          case Some(prev) =>
            val byName = df.schema.map(f => f.name -> f).toMap
            prev.foreach { pf =>
              byName.get(pf.name).foreach(nf =>
                require(nf.dataType == pf.dataType,
                  s"schema evolution type conflict on '${pf.name}': " +
                    s"${pf.dataType} vs ${nf.dataType}"))
            }
            val prevNames = prev.fieldNames.toSet
            org.apache.spark.sql.types.StructType(
              prev.fields ++ df.schema.fields.filterNot(f =>
                prevNames.contains(f.name)))
          case None => df.schema
        }
      else df.schema
    // persist the snapshot schema so an empty snapshot (0-partition
    // commit) still reads back as a typed empty frame; base64 keeps the
    // schema JSON's quotes/field names out of the regex-parsed manifest
    val schemaB64 = java.util.Base64.getEncoder.encodeToString(
      snapshotSchema.json.getBytes("UTF-8"))
    val json = all.map(p => "\"" + p + "\"")
      .mkString(
        s"""{$txnField"version":$next,"mode":"$mode","schemaB64":"$schemaB64","files":[""",
        ",", "]}")
    val mDir = manifestDir(path)
    f.mkdirs(mDir)
    // the publish point, all-or-nothing on every backend (tmp+rename
    // where rename is atomic, one atomic PUT on object stores —
    // [[AtomicIo.publishFile]]): readers see the old latest manifest
    // or the new one, never a partial file. NOTE this log design is
    // object-store-safe END TO END: the batch-dir rename above is
    // only a placement optimization (a crashed copy+delete leaves a
    // partial b<next> that no manifest references and the replayed
    // commit deletes), because readers resolve files through the
    // MANIFEST, never by listing data/.
    AtomicIo.publishFile(f, new Path(mDir, f"v$next%05d.json"),
      json.getBytes("UTF-8"))
    next
  }

  /** Snapshot file list + commit-time schema, for external table
    * surfaces ([[graft.sources.VersionedTable]]) that build their own
    * scan over the manifest's files. Schema is None only for
    * pre-schema manifests (none are written anymore).
    */
  def snapshot(spark: SparkSession, path: String,
               asOf: Option[Long] = None)
      : (Seq[String], Option[org.apache.spark.sql.types.StructType]) = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions at $path")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    (manifestFiles(spark, path, v), manifestSchema(spark, path, v))
  }

  /** Read a snapshot: the latest version, or `asOf` for time travel. */
  def read(spark: SparkSession, path: String,
           asOf: Option[Long] = None): DataFrame = {
    val (files, schema) = snapshot(spark, path, asOf)
    if (files.nonEmpty) schema match {
      // read under the COMMIT-TIME snapshot schema: files predating an
      // appended column null-fill it, and the column set/order is the
      // manifest's — never whichever file footer the reader sampled
      // (the nondeterminism an evolved snapshot would otherwise have)
      case Some(s) => spark.read.schema(s).parquet(files: _*)
      case None => spark.read.parquet(files: _*) // pre-schema manifest
    }
    else schema match {
      case Some(s) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case None => spark.emptyDataFrame // pre-schema manifest
    }
  }

  private def manifestSchema(spark: SparkSession, path: String,
                             version: Long): Option[org.apache.spark.sql.types.StructType] = {
    val f = fs(spark, path)
    val p = new Path(manifestDir(path), f"v$version%05d.json")
    val in = f.open(p)
    val json = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
    "\"schemaB64\":\"([^\"]+)\"".r.findFirstMatchIn(json).map { m =>
      org.apache.spark.sql.types.DataType.fromJson(new String(
        java.util.Base64.getDecoder.decode(m.group(1)), "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
  }

  /** Drop manifests older than the newest `keepLast` and delete data
    * files no kept manifest references. Returns deleted file count.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the latest version")
    val f = fs(spark, path)
    val vs = versions(spark, path)
    val (drop, keep) = vs.splitAt((vs.size - keepLast).max(0))
    val live = keep.flatMap(manifestFiles(spark, path, _)).toSet
    val dead = drop.flatMap(manifestFiles(spark, path, _)).toSet -- live
    dead.foreach(p => f.delete(new Path(p), false))
    drop.foreach(v =>
      f.delete(new Path(manifestDir(path), f"v$v%05d.json"), false))
    // empty batch dirs left behind are cosmetic; clear them if
    // drained. Dead writers' private temp dirs (.b*.tmp-*) are
    // unreferenced by construction — sweep them too.
    val dataDir = new Path(path, "data")
    if (f.exists(dataDir))
      f.listStatus(dataDir).foreach { st =>
        if (st.getPath.getName.startsWith(".b") &&
            st.getPath.getName.contains(".tmp-"))
          f.delete(st.getPath, true)
        else if (f.listStatus(st.getPath).isEmpty)
          f.delete(st.getPath, false)
      }
    dead.size
  }
}
