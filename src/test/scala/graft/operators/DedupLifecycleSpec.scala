package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Maintained signature-table lifecycle + operator cache hygiene. */
class DedupLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def sigsOf(pred: org.apache.spark.sql.Column) = {
    val docs = Tables.documents(spark, sf).filter(pred)
    Dedup.minhashSignatures(
      Dedup.docShingles(docs, "doc_id", "text", 3, dedup = false), "doc_id")
  }

  test("signature table: write, append, compact, read round-trip") {
    val table = Files.createTempDirectory("graft_sig_spec_").toString + "/t"
    val a = sigsOf(col("doc_id") % 2 === 0)
    val b = sigsOf(col("doc_id") % 2 =!= 0)
    Dedup.writeSignatures(a, "doc_id", table)
    Dedup.appendSignatures(b, "doc_id", table)
    Dedup.compactSignatures(spark, table)

    val back = Dedup.readSignatures(spark, table)
    val all = sigsOf(lit(true))
    assert(back.count() == all.count())
    // bit-exact signatures through the partitioned layout
    assert(back.join(all, Seq("doc_id", "mh0", "mh7", "mh15"), "inner")
      .count() == all.count())

    // compaction leaves exactly one parquet file per sig_part dir
    val dirs = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sig_part="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${d.getName}: expected 1 file post-compaction, got ${files.length}")
    }
  }

  test("auto-compaction folds tombstones at the pending-batch bound") {
    val table = Files.createTempDirectory("graft_sig_ac_").toString + "/t"
    val all = sigsOf(lit(true))
    Dedup.writeSignatures(all, "doc_id", table)
    val total = all.count()
    def pendingTombstones(): Int = {
      val d = new java.io.File(
        graft.io.GenTable.live(spark, table), "_tombstones")
      if (!d.exists) 0 else d.listFiles().count(_.isDirectory)
    }
    spark.conf.set("spark.graft.autoCompactPendingBatches", "2")
    try {
      val del1 = Tables.documents(spark, sf)
        .filter(col("doc_id") % 5 === 0).select("doc_id")
      val del2 = Tables.documents(spark, sf)
        .filter(col("doc_id") % 5 === 1).select("doc_id")
      val gone = del1.union(del2).distinct().count()
      // below the bound: the tombstone stays pending
      Dedup.deleteSignaturesDeferred(spark, table, del1, "doc_id", 1L)
      assert(pendingTombstones() == 1,
        "one batch below the bound must stay a pending tombstone")
      // at the bound: the delete itself folds — no caller discipline
      Dedup.deleteSignaturesDeferred(spark, table, del2, "doc_id", 2L)
      assert(pendingTombstones() == 0,
        "reaching the bound must auto-fold the tombstones")
      // folded base: rows physically gone, reads unchanged
      val live = graft.io.GenTable.live(spark, table)
      assert(spark.read.parquet(live).count() == total - gone,
        "the auto-fold must physically drop the tombstoned rows")
      assert(Dedup.readSignatures(spark, table).count() == total - gone)
      assert(Dedup.readSignatures(spark, table)
        .filter(col("doc_id") % 5 <= 1).count() == 0)
    } finally spark.conf.unset("spark.graft.autoCompactPendingBatches")
  }

  test("readSignaturesFor prunes the scan to the touched hash partitions") {
    val table = Files.createTempDirectory("graft_sig_prune_").toString + "/t"
    val all = sigsOf(lit(true))
    Dedup.writeSignatures(all, "doc_id", table)
    Dedup.compactSignatures(spark, table)
    val total = all.count()

    // a handful of ids touches a strict subset of the 16 sig_part dirs
    val wanted = Tables.documents(spark, sf)
      .select("doc_id").orderBy("doc_id").limit(3)
    val pruned = Dedup.readSignaturesFor(spark, table, wanted, "doc_id")

    // correctness: exactly the requested signatures
    val full = Dedup.readSignatures(spark, table)
      .join(wanted, Seq("doc_id"), "left_semi")
    assert(pruned.orderBy("doc_id").collect().toSeq ==
      full.orderBy("doc_id").collect().toSeq)
    assert(pruned.count() == 3)

    // MEASURED pruning: the scan must emit only the touched
    // partitions' rows, not the table (the Z-order evidence pattern —
    // ScanAudit numbers, not plan prose)
    val read = graft.plans.ScanAudit.measure(
      Dedup.readSignaturesFor(spark, table, wanted, "doc_id")).rowsRead
    assert(read < total / 2,
      s"3 ids must not scan the whole table: read $read of $total")
    // and the pruning is the STATIC partition filter, visible in plan
    val plan = Dedup.readSignaturesFor(spark, table, wanted, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sig_part"),
      s"sig_part must prune at the partition level:\n$plan")
  }

  test("deferred delete: tombstone masks every read, base files untouched") {
    val table = Files.createTempDirectory("graft_sig_ts_").toString + "/t"
    val all = sigsOf(lit(true))
    Dedup.writeSignatures(all, "doc_id", table)
    Dedup.compactSignatures(spark, table)
    val total = all.count()

    def baseFiles(): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(table))
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getPath.contains("_tombstones"))
        .map(f => (f.getPath, f.lastModified, f.length)).sortBy(_._1)
    }
    val before = baseFiles()

    val del = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).select("doc_id")
    val delCount = del.distinct().count()
    assert(delCount > 0)
    Dedup.deleteSignaturesDeferred(spark, table, del, "doc_id", batchId = 1L)

    // the O(batch) claim, physically: not one base file rewritten
    assert(baseFiles() == before,
      "deferred delete must not rewrite any base parquet file")
    // full read masks the ids
    val back = Dedup.readSignatures(spark, table)
    assert(back.count() == total - delCount)
    assert(back.filter(col("doc_id") % 5 === 0).count() == 0)
    // point read: a deleted id resolves empty, a survivor intact
    val one = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).select("doc_id").limit(1)
    assert(Dedup.readSignaturesFor(spark, table, one, "doc_id").count() == 0)
    val survivor = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 =!= 0).select("doc_id").limit(1)
    assert(Dedup.readSignaturesFor(spark, table, survivor, "doc_id")
      .count() == 1)
    // committed replay of the same batch id no-ops
    Dedup.deleteSignaturesDeferred(spark, table, del, "doc_id", batchId = 1L)
    assert(Dedup.readSignatures(spark, table).count() == total - delCount)

    // a delete under a DIFFERENT batch id with different content is a
    // new tombstone, not a replay (content-keyed dirs): the batch-id
    // era-reset case must never silently skip a real delete
    val del2 = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 1 && col("doc_id") % 5 =!= 0)
      .select("doc_id")
    val del2Count = del2.distinct().count()
    Dedup.deleteSignaturesDeferred(spark, table, del2, "doc_id", batchId = 1L)
    assert(Dedup.readSignatures(spark, table).count() ==
      total - delCount - del2Count,
      "same batch id, different content must land as a NEW tombstone")

    // re-appending tombstoned ids self-heals: the clash triggers an
    // inline fold (old rows physically dropped, tombstones cleared)
    // and the append lands unmasked — a maintaining ingest stream
    // must not crash-loop when a forgotten doc is resubmitted
    val readd = sigsOf(col("doc_id") % 5 === 0).localCheckpoint()
    Dedup.appendSignatures(readd, "doc_id", table)
    assert(!new java.io.File(table, "_tombstones").exists,
      "the clash append must fold the pending tombstones")
    assert(Dedup.readSignatures(spark, table).count() ==
      total - del2Count,
      "after the self-heal the re-added rows must be visible")
    assert(Dedup.readSignatures(spark, table)
      .filter(col("doc_id") % 5 === 0).count() > 0)

    // compaction after the fold is a plain rewrite: state unchanged
    Dedup.compactSignatures(spark, table)
    assert(spark.read.parquet(table).count() == total - del2Count,
      "folded base must physically match the read")
    assert(Dedup.readSignatures(spark, table).count() == total - del2Count)
  }

  test("dedup operators leave the CacheManager empty (no persist leaks)") {
    spark.sharedState.cacheManager.clearCache()
    val docs = Tables.documents(spark, sf)
    Dedup.dedupCorpusTransitive(docs, "doc_id", "text").count()
    Dedup.minhashNearDups(docs, "doc_id", "text").count()
    Dedup.ngramJaccardBlocked(docs, "doc_id", "text", "source").count()
    Dedup.incrementalDedup(docs.filter($"doc_id" % 2 =!= 0), "doc_id",
      "text", sigsOf(col("doc_id") % 2 === 0).localCheckpoint()).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "an orchestrated dedup session must not accumulate cache entries")
  }

  test("connectedComponents fails loudly on non-convergence") {
    // a pure chain has diameter n−1: min-label propagation cannot
    // finish in 2 rounds, and a silent partial result would keep
    // several representatives per cluster (r2 advice)
    val pairs = (0L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val verts = (0L to 10L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, verts, "doc_id", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds the same graph converges to one component
    val ok = Dedup.connectedComponents(pairs, verts, "doc_id")
    assert(ok.select("component").distinct().count() == 1)
  }

  test("pointer jumping collapses a 300-chain in logarithmic rounds") {
    // plain min-label propagation needs ~diameter rounds (299 here);
    // with the label-of-label jump the reach roughly doubles per round
    // (2, 6, 14, 30, … = 2^(k+1)−2), so 12 rounds must suffice — and
    // the non-convergence guard turns any regression into a loud fail
    val n = 300L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val verts = (0L until n).toDF("doc_id")
    val out = Dedup.connectedComponents(pairs, verts, "doc_id",
      maxIter = 12)
    assert(out.select("component").distinct().count() == 1)
    assert(out.filter($"component" === 0L).count() == n)
  }

  test("reliableCheckpoint conf: whitespace/case variants accepted, typos rejected") {
    import spark.implicits._
    val key = "spark.graft.reliableCheckpoint"
    val prev = spark.conf.getOption(key)
    val df = Seq(1, 2, 3).toDF("x")
    try {
      // normalization (.trim.toLowerCase) must accept ' Never ' et al.
      spark.conf.set(key, " Never ")
      assert(graft.Checkpoints.stabilize(df).as[Int].collect().sorted
        .toSeq == Seq(1, 2, 3))
      spark.conf.set(key, "NEVER")
      assert(graft.Checkpoints.stabilize(df).count() == 3)
      // anything else fails fast — a typo like 'off' must not silently
      // enable reliable checkpointing when a dir happens to be set
      spark.conf.set(key, "off")
      intercept[IllegalArgumentException] {
        graft.Checkpoints.stabilize(df)
      }
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  test("reliable checkpoint mode: same results, files actually land") {
    // with a checkpoint dir configured, the iterative loops must write
    // RELIABLE checkpoints (cluster-survivable) instead of
    // localCheckpoint blocks — and produce identical output
    val docs = Tables.documents(spark, sf)
    val plain = Dedup.dedupCorpusTransitive(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    // the clustering prelude is session-memoized; drop it so the
    // reliable-mode run actually recomputes (and checkpoints) it
    graft.Memo.clear()
    try {
      val reliable = Dedup.dedupCorpusTransitive(docs, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(reliable == plain, "checkpoint mode must not change results")
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "reliable checkpoints must write files")
    } finally {
      // the dir can't be unset on a live context — flip the escape
      // hatch so the shared session's other suites keep localCheckpoint
      spark.conf.set("spark.graft.reliableCheckpoint", "never")
      // and drop anything memoized during the reliable window: those
      // frames are backed by the checkpoint files deleted below, and a
      // later suite hitting the same memo key would read a ghost
      graft.Memo.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("incrementalDedupWithSigs returns exactly the survivors' signatures") {
    val docs = Tables.documents(spark, sf)
    val existing = sigsOf(col("doc_id") % 2 === 0).localCheckpoint()
    val (survivors, sigs) = Dedup.incrementalDedupWithSigs(
      docs.filter($"doc_id" % 2 =!= 0), "doc_id", "text", existing)
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet
    val sigIds = sigs.select("doc_id").as[Long].collect().toSet
    assert(sigIds == survivorIds)
    // and the signatures are the batch signatures, not recomputed junk
    val direct = sigsOf(col("doc_id") % 2 =!= 0)
    assert(sigs.join(direct, Seq("doc_id", "mh0", "mh15"), "left_semi")
      .count() == sigIds.size)
  }

  // hand-crafted signature fixture for forgetDocs: A≈B on perms 0-7
  // (bands 0,1), B≈C on perms 8-15 (bands 2,3), A and C share nothing
  // — a bridge chain; plus an untouched pair D≈E and a singleton F
  private def forgetFixture = {
    def sig(id: Long, lo: Long, hi: Long) =
      (id, (0 until 8).map(lo + _) ++ (0 until 8).map(hi + _))
    val rows = Seq(sig(1L, 100, 200), sig(2L, 100, 300), sig(3L, 400, 300),
      sig(10L, 500, 600), sig(11L, 500, 600), sig(20L, 700, 800))
    val cols = "doc_id" +: (0 until 16).map(j => s"mh$j")
    val sigs = rows.map { case (id, vs) => Row.fromSeq(id +: vs) }
    val schema = org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sigs), schema)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("doc_id", "component")
    (df, labels)
  }
  private val Row = org.apache.spark.sql.Row

  test("forgetDocs splits a component when the deleted doc was the bridge") {
    val (sigs, labels) = forgetFixture
    // sanity: the fixture's pair graph is the chain 1—2—3 plus 10—11
    val pairs = Dedup.estimatedJaccard(
      Dedup.lshCandidatePairs(sigs, "doc_id"), sigs, "doc_id")
      .filter($"est_jaccard" >= 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L), (10L, 11L)), pairs)
    val got = Dedup.forgetDocs(labels, sigs,
        Seq(2L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the stored stars (1—1, 2—1, 3—1) would keep 3 attached to 1;
    // the signature-derived repair must split them
    assert(got == Map(1L -> 1L, 3L -> 3L, 10L -> 10L, 11L -> 10L,
      20L -> 20L), got.toString)
  }

  test("forgetDocs relabels when the deleted doc was the min-id label") {
    val (sigs, labels) = forgetFixture
    val got = Dedup.forgetDocs(labels, sigs,
        Seq(1L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2—3 stay connected (perms 8-15), new min label 2; untouched
    // components carry over byte-identically
    assert(got == Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L,
      20L -> 20L), got.toString)
  }
}
