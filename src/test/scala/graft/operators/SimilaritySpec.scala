package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f), 1),  // orthogonal to 1
    (4L, Array(-1.0f, 0.0f, 0.0f), 1), // opposite of 1
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k orders by cosine, excludes self") {
    val r = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding", 3)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    assert(r.toSeq == Seq(2L, 3L, 4L), s"got ${r.toSeq}")
  }

  test("cosine values are exact for known vectors") {
    val r = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding", 3)
      .orderBy("rank").select("cos_sim").as[Double].collect()
    assert(math.abs(r(1) - 0.0) < 1e-9, "orthogonal → 0")
    assert(math.abs(r(2) + 1.0) < 1e-9, "opposite → -1")
  }

  test("ivf probes only the query's cell") {
    val r = Similarity.ivfTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding", "label", 3)
      .select("neighbor_id").as[Long].collect()
    assert(r.toSeq == Seq(2L), "only same-label (cell 0) neighbors probed")
  }

  test("row-local cell assignment ≡ window assignToCentroids, bit-equal") {
    // the single-pass lifecycle route (withCellLocal) must pick the
    // IDENTICAL cell as the window-argmin form on real embeddings —
    // same left-folded float-vs-double l2Sq, same (d asc, cluster asc)
    // tie-break — or the stored index and its oracle replay diverge
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cent = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("cluster"),
        col("embedding").cast("array<double>").as("cv"))
    val win = Similarity.assignToCentroids(e, "vec_id", "embedding", cent)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loc = Similarity.withCellLocal(
      e.select(col("vec_id"), col("embedding")), "embedding", cent)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loc == win, "row-local argmin diverged from the window form")
    assert(win.nonEmpty)
  }

  test("kmeans recovers separable clusters and assignment is nearest-centroid") {
    // 3 well-separated groups of 8 vectors around orthogonal bases,
    // deterministic jitter; ids interleaved across groups so the seed
    // centroids (3 smallest ids) start one-per-group
    val pts = (0 until 24).map { i =>
      val g = i % 3
      val base = Array.tabulate(4)(j => if (j == g) 10.0f else 0.0f)
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        x + ((i * 7 + j * 3) % 5) * 0.1f }, g)
    }.toDF("vec_id", "embedding", "truth")
    val (assign, cent) = Similarity.kmeans(pts, "vec_id", "embedding", 3, 3)
    assert(cent.count() == 3)
    val m = assign.join(pts, "vec_id").select("cluster", "truth")
      .as[(Int, Int)].collect().toSeq
    // each truth group lands in exactly one kmeans cluster, and the
    // 3 clusters are distinct
    val byTruth = m.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byTruth.values.forall(_.size == 1), s"split cluster: $byTruth")
    assert(byTruth.values.flatten.toSet.size == 3, s"merged clusters: $byTruth")
    // every assignment is the argmin centroid (dist2 vs each centroid)
    val worst = assign.agg(org.apache.spark.sql.functions.max("dist2"))
      .head.getDouble(0)
    assert(worst < 1.0, s"within-cluster dist2 should be tiny, got $worst")
  }

  test("diversitySample keeps sqrt-budget most-central rows per cluster") {
    // cluster 0: 9 points near (10,0) → budget ceil(sqrt(9)) = 3
    // cluster 1: 2 points near (0,10) → budget ceil(sqrt(2)) = 2
    val pts = ((0 until 9).map { i =>
      (i.toLong, Array(10.0f + i * 0.5f, 0.0f)) // dist2 grows with id
    } ++ Seq((100L, Array(0.0f, 10.0f)), (101L, Array(0.0f, 10.5f))))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(10.0, 0.0)), (1, Array(0.0, 10.0)))
      .toDF("cluster", "cv")
    val got = Similarity.diversitySample(pts, "vec_id", "embedding", cents)
      .orderBy("vec_id")
      .select("vec_id", "cluster", "c_size", "rank_in_cluster")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // cluster 0 keeps its 3 most-central ids (0,1,2 — dist2 rises with
    // id); cluster 1 keeps both members
    assert(got == Seq((0L, 0, 9L, 1L), (1L, 0, 9L, 2L), (2L, 0, 9L, 3L),
      (100L, 1, 2L, 1L), (101L, 1, 2L, 2L)), s"got $got")
  }

  test("diversitySample maxPerCluster caps the sqrt budget") {
    val pts = (0 until 100).map(i => (i.toLong, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0, 0.0))).toDF("cluster", "cv")
    val got = Similarity.diversitySample(pts, "vec_id", "embedding", cents,
      maxPerCluster = 4)
    // sqrt budget would be 10; cap wins
    assert(got.count() == 4)
  }

  test("diversitySample ranking runs on the GroupedTopK heap, not a sort") {
    val pts = (0 until 20).map(i => (i.toLong, Array(1.0f, i * 0.1f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0, 0.0))).toDF("cluster", "cv")
    val plan = Similarity.diversitySample(pts, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    // two row_numbers in the operator: the argmin (partition by id) and
    // the per-cluster rank — BOTH must hit the heap rewrite
    assert(!plan.contains("WindowExec"),
      s"expected no WindowExec (heap rewrite), got:\n$plan")
  }

  test("vector index lifecycle: write+append == one-shot write; query prunes") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cent = e.filter($"vec_id" < 4L)
      .select($"vec_id".cast("int").as("cluster"),
        $"embedding".cast("array<double>").as("cv"))
    val p1 = java.nio.file.Files.createTempDirectory("vidx1_").toString + "/i"
    val p2 = java.nio.file.Files.createTempDirectory("vidx2_").toString + "/i"
    Similarity.writeVectorIndex(e, "vec_id", "embedding", cent, p1)
    Similarity.writeVectorIndex(e.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", cent, p2)
    Similarity.appendVectorIndex(e.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", p2)
    // identical contents: the frozen centroids route the append batch
    // to the same cells the one-shot write chose
    val a = Similarity.readVectorIndex(spark, p1)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.get(1)))
    val b = Similarity.readVectorIndex(spark, p2)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.get(1)))
    assert(a.toSet == b.toSet && a.length == b.length)
    // stored-index query == in-memory ivfTopK over the same cells
    val queries = e.filter($"vec_id" % 17 === 0)
    val got = Similarity.queryVectorIndex(spark, p1, queries,
      "vec_id", "embedding", 3)
    val cells = Similarity.assignToCentroids(e, "vec_id", "embedding", cent)
      .select($"vec_id", $"cluster".as("cell"))
      .join(e.select($"vec_id", $"embedding"), "vec_id")
    val want = Similarity.ivfTopK(
      cells.join(queries.select("vec_id"), Seq("vec_id"), "left_semi"),
      cells, "vec_id", "embedding", "cell", 3)
    assert(got.collect().toSet == want.collect().toSet,
      "stored-index query must match the in-memory IVF result")
    // the probe filter must reach the INDEX scan as a PartitionFilter
    val plan = got.queryExecution.executedPlan.toString
    val indexScan = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("/vectors"))
      .toSeq
    assert(indexScan.nonEmpty, s"no index scan found:\n$plan")
    assert(indexScan.forall(_.contains("PartitionFilters: [cell")),
      s"cell probe must prune index partitions:\n${indexScan.mkString("\n")}")

    // MEASURED pruning, not just plan prose (the signature-table
    // evidence pattern): one query vector probes ONE of the 4 cells,
    // so the INDEX scan node must emit well under the full index —
    // the pruned cells' rows are never read. Measured on the index
    // scan's own numOutputRows (the query/centroid side reads are
    // separate scan nodes).
    val one = e.filter($"vec_id" === 0L)
    val indexRows = Similarity.readVectorIndex(spark, p1).count()
    val probedIndexRows = graft.plans.ScanAudit.measureFor(
      Similarity.queryVectorIndex(spark, p1, one, "vec_id", "embedding", 3),
      "/vectors").rowsRead
    assert(probedIndexRows > 0 && probedIndexRows < indexRows / 2,
      s"1-cell probe must not scan the index: read $probedIndexRows " +
        s"of $indexRows index rows")
  }

  test("reindex under drift: clumped appends rebalance, pruning survives") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cent = e.filter($"vec_id" < 4L)
      .select($"vec_id".cast("int").as("cluster"),
        $"embedding".cast("array<double>").as("cv"))
    val p = java.nio.file.Files.createTempDirectory("vidxr_").toString + "/i"
    Similarity.writeVectorIndex(e.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", cent, p)
    // worst-case drift: every appended vector is IDENTICAL (cell 0's
    // own centroid), so the whole batch lands in one cell
    val clump = e.filter($"vec_id" % 2 =!= 0)
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        cent.filter($"cluster" === 0)
          .select($"cv".cast("array<float>").as("__cv"))))
      .select($"vec_id", $"__cv".as("embedding"))
    Similarity.appendVectorIndex(clump, "vec_id", "embedding", p)
    val before = Similarity.indexCellStats(spark, p).head()
    // drift detected: the clumped cell dominates
    assert(before.getDouble(3) > 1.5,
      s"fixture must be imbalanced, got $before")
    Similarity.reindexVectorIndex(spark, p, "vec_id", "embedding",
      Similarity.hashSeeds(Similarity.readVectorIndex(spark, p),
        "vec_id", "embedding", 4))
    val after = Similarity.indexCellStats(spark, p).head()
    // the hash re-seed samples the clump, so identical vectors spread
    // across every cell seeded FROM the clump; imbalance must drop
    assert(after.getDouble(3) < before.getDouble(3),
      s"reindex must rebalance: before=$before after=$after")
    assert(after.getLong(1) == before.getLong(1), "rows lost in reindex")
    // the rebuilt index still serves pruned queries
    val got = Similarity.queryVectorIndex(spark, p,
      e.filter($"vec_id" === 0L), "vec_id", "embedding", 3)
    val plan = got.queryExecution.executedPlan.toString
    val indexScan = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("/vectors"))
      .toSeq
    assert(indexScan.nonEmpty && indexScan.forall(l =>
      l.contains("PartitionFilters: [") &&
        l.split("PartitionFilters: ")(1).takeWhile(_ != ']')
          .contains("cell")),
      s"rebuilt index must still prune:\n$plan")
    assert(got.count() == 3)
  }

  test("PQ index lifecycle: write+append == one-shot; query prunes and " +
      "never scans floats") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cent = e.filter($"vec_id" < 4L)
      .select($"vec_id".cast("int").as("cluster"),
        $"embedding".cast("array<double>").as("cv"))
    val cb = Similarity.pqSeedCodebook(e, "vec_id", "embedding", 8, 8, 16)
      .localCheckpoint()
    val p1 = java.nio.file.Files.createTempDirectory("pqidx1_").toString + "/i"
    val p2 = java.nio.file.Files.createTempDirectory("pqidx2_").toString + "/i"
    Similarity.writePqIndex(e, "vec_id", "embedding", cent, cb, 8, 8, p1)
    Similarity.writePqIndex(e.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", cent, cb, 8, 8, p2)
    Similarity.appendPqIndex(e.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", p2)
    // identical contents: frozen centroids+codebook make the append
    // batch land exactly where the one-shot write put it
    def codesOf(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Int]]("codes"), r.getAs[Int]("cell")))
    assert(codesOf(p1).toSet == codesOf(p2).toSet &&
      codesOf(p1).length == codesOf(p2).length)
    // stored-index query == in-memory ivfPqTopK over the same frames
    val queries = e.filter($"vec_id" % 17 === 0)
    val got = Similarity.queryPqIndex(spark, p1, queries,
      "vec_id", "embedding", 3)
    val cells = Similarity.assignToCentroids(e, "vec_id", "embedding", cent)
      .select($"vec_id", $"cluster".as("cell"))
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb, 8, 8)
      .join(cells, "vec_id")
    val want = Similarity.ivfPqTopK(
      cells.join(e.select("vec_id", "embedding"), "vec_id")
        .join(queries.select("vec_id"), Seq("vec_id"), "left_semi"),
      codes, "vec_id", "embedding", "cell", cb, 8, 8, 3)
    assert(got.collect().toSet == want.collect().toSet,
      "stored-index query must match the in-memory IVFADC result")
    // probe filter must prune codes partitions, measured not asserted
    val plan = got.queryExecution.executedPlan.toString
    val codesScan = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("/codes"))
      .toSeq
    assert(codesScan.nonEmpty, s"no codes scan found:\n$plan")
    assert(codesScan.forall(_.contains("PartitionFilters: [cell")),
      s"cell probe must prune codes partitions:\n${codesScan.mkString("\n")}")
    val one = e.filter($"vec_id" === 0L)
    val allCodes = spark.read.parquet(s"$p1/codes").count()
    val probed = graft.plans.ScanAudit.measureFor(
      Similarity.queryPqIndex(spark, p1, one, "vec_id", "embedding", 3),
      "/codes").rowsRead
    assert(probed > 0 && probed < allCodes / 2,
      s"1-cell probe must not scan the codes table: $probed of $allCodes")
  }

  test("matryoshkaTopK: full prefix + full candidates ≡ brute force; k guard") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = e.filter($"vec_id" % 25 === 0)
    val n = e.count().toInt
    val got = Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding",
      prefixDim = 64, k = 5, candidates = n)
      .collect().map(_.toSeq).toSet
    val bf = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    assert(got == bf)
    // the harness embeddings are NOT MRL-trained (information is
    // uniform across dims — a 16-dim prefix carries 1/4 of the
    // signal), so pin the coarse pass FAR ABOVE CHANCE rather than at
    // trained-embedding agreement; exactness is the full-prefix case
    // above plus the DuckDB oracle (measured here: 5/20 vs the ~1/500
    // random rank-1 hit rate)
    val pre = Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding",
      prefixDim = 16, k = 5, candidates = 20)
      .filter($"rank" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val bf1 = bf.filter(_(1) == 1).map(r => (r(0), r(2))).toMap
    val agree = pre.count { case (q, nb) => bf1(q) == nb }
    assert(agree * 10 >= pre.size,
      s"rank-1 agreement not above chance: $agree of ${pre.size}")
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding", 16,
        k = 10, candidates = 5)
    }
  }

  test("multi-probe IVF: rank-1 ≡ assignment, full probe ≡ brute force") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cent = e.filter($"vec_id" < 6L)
      .select($"vec_id".as("cluster"),
        $"embedding".cast("array<double>").as("cv"))
    val qs = e.filter($"vec_id" % 25 === 0)
    // probe_rank = 1 of the multi-probe frame is exactly the
    // single-cell assignment
    val p1 = Similarity.assignProbeCells(qs, "vec_id", "embedding", cent, 3)
      .filter($"probe_rank" === 1)
      .select($"vec_id", $"cell".as("cluster"), $"dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a1 = Similarity.assignToCentroids(qs, "vec_id", "embedding", cent)
      .select($"vec_id", $"cluster", $"dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(p1 == a1)
    // probing EVERY cell makes IVF exhaustive: result ≡ brute force
    val corpus = Similarity.assignToCentroids(e, "vec_id", "embedding", cent)
      .select($"vec_id", $"cluster".as("cell"))
      .join(e.select("vec_id", "embedding"), "vec_id")
    val probes = Similarity.assignProbeCells(qs, "vec_id", "embedding",
        cent, nprobe = 6)
      .select($"vec_id", $"cell")
      .join(e.select("vec_id", "embedding"), "vec_id")
    val ivf = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding",
      "cell", 5).collect().map(_.toSeq).toSet
    val bf = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    assert(ivf == bf, "full-probe IVF must equal the exhaustive scan")
  }

  test("hardNegatives: same-label excluded, nearest wrong-label win") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // query
      (1L, Array(1.0f, 0.01f), 0),  // same label: nearest but excluded
      (2L, Array(1.0f, 0.1f), 1),   // wrong label, very close → rank 1
      (3L, Array(0.0f, 1.0f), 1),   // wrong label, orthogonal → rank 2
    ).toDF("vec_id", "embedding", "label")
    val q = vecs.filter($"vec_id" === 0L)
    val got = Similarity.hardNegatives(q, vecs, "vec_id", "embedding",
      "label", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 2L), (2, 3L)), s"got ${got.toSeq}")
  }

  test("centroidOutliers: per-cluster quantile cutoff, strict exceed") {
    val cent = Seq((0L, Array(0.0, 0.0)), (1L, Array(10.0, 0.0)))
      .toDF("cluster", "cv")
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)),   // d2 = 0
      (2L, Array(0.1f, 0.0f)),   // d2 = 0.01
      (3L, Array(0.2f, 0.0f)),   // d2 = 0.04
      (4L, Array(0.3f, 0.0f)),   // d2 = 0.09
      (5L, Array(3.0f, 0.0f)),   // d2 = 9 → the outlier
      (6L, Array(10.0f, 0.0f)),  // cluster 1, alone: never an outlier
    ).toDF("vec_id", "embedding")
    val got = Similarity.centroidOutliers(vecs, "vec_id", "embedding",
      cent, q = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // cluster 0 p90 over [0, .01, .04, .09, 9] = .09 + .6·8.91 = 5.436
    assert(got.toSeq == Seq((5L, 0L, 9.0)), s"got ${got.toSeq}")
  }

  test("int8 quantization: error <= scale/2, extremes hit ±127, zero-safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.27f, 1.27f, 0.001f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "embedding")
      .select($"vec_id", $"q_scale", $"q_vec", $"embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2), r.getSeq[Float](3))).toMap
    val (s1, qv1, v1) = q(1L)
    assert(math.abs(s1 - 1.27f.toDouble / 127.0) < 1e-15)
    assert(qv1(1) == -127 && qv1(2) == 127, s"extremes: $qv1")
    // dequantization error bound per component
    qv1.zip(v1).foreach { case (qi, vi) =>
      assert(math.abs(qi * s1 - vi) <= s1 / 2 + 1e-12,
        s"dequant error above scale/2 at q=$qi v=$vi")
    }
    val (s2, qv2, _) = q(2L)
    assert(s2 == 0.0 && qv2.forall(_ == 0), "zero vector must be all zeros")
  }

  test("lsh buckets separate opposite vectors, keep near ones") {
    val r = Similarity.lshTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding",
      dim = 3, numPlanes = 4, k = 3)
      .select("neighbor_id").as[Long].collect()
    assert(r.contains(2L), "near-identical vector must share the bucket")
    assert(!r.contains(4L), "opposite vector must hash to another bucket")
  }

  test("int8RescoreTopK: equals brute force when candidates cover corpus") {
    val q = vecs.filter($"vec_id" === 1L)
    val exact = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val viaInt8 = Similarity.int8RescoreTopK(q, vecs, "vec_id", "embedding",
      3, candidates = 100)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(viaInt8.toSeq == exact.toSeq,
      "full-candidate rescore must reduce to exact brute force")
  }

  test("mmrTopK diversifies: near-dup demoted below a distinct hit") {
    // q = x-axis; 1 and 2 are near-identical (+y tilt), 3 mirrors the
    // tilt (-y): equally relevant but DIVERSE; 4 is barely relevant.
    // Pure relevance order is (2, 1, 3) — MMR must pick (2, 3, 1).
    val d = Seq(
      (1L, Seq(0.9f, 0.43f, 0.0f)),
      (2L, Seq(0.9f, 0.42f, 0.05f)),
      (3L, Seq(0.9f, -0.43f, 0.0f)),
      (4L, Seq(0.1f, 0.99f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(d, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), k = 3, lambda = 0.5, candidates = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == Seq((1, 2L), (2, 3L), (3, 1L)),
      s"expected diverse order (2,3,1), got ${got.mkString(",")}")
  }

  test("sparseCosinePairs: exact integer dots, df cap, threshold") {
    val d = Seq(
      (1L, "apple banana apple"),       // tf: apple 2, banana 1 → |v|²=5
      (2L, "apple banana cherry"),      // all tf 1 → |v|²=3
      (3L, "cherry date elderberry"),   // shares only cherry with 2
      (4L, "fig grape honeydew"),       // shares nothing
    ).toDF("doc_id", "text")
    val got = Similarity.sparseCosinePairs(d, "doc_id", "text",
      dfCap = 10, tNum = 1, tDen = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // (1,2): dot = 2·1 + 1·1 = 3, cos = 3/√15 ≈ 0.7746 → kept
    assert(got((1L, 2L))._1 == 3L)
    assert(math.abs(got((1L, 2L))._2 - 3.0 / math.sqrt(15.0)) < 1e-6)
    // (2,3): dot = 1, cos = 1/3 < 1/2 → integer test must drop it
    assert(!got.contains((2L, 3L)), s"sub-threshold pair leaked: $got")
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L))
    // df cap: with dfCap=1, apple/banana/cherry (df 2) drop out of the
    // pairing space entirely → no pairs at all
    val capped = Similarity.sparseCosinePairs(d, "doc_id", "text",
      dfCap = 1, tNum = 1, tDen = 2).count()
    assert(capped == 0, "df-capped tokens must not pair")
  }

  // ---- product quantization ------------------------------------------

  test("pqEncode/pqTopK: hand-checked codes and ADC on a tiny case") {
    // 2 subspaces × 1 dim, codebook from the 2 smallest ids:
    // codewords per subspace = {v0's, v1's} components
    val d = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(10.0f, 10.0f)),
      (2L, Array(9.0f, 1.0f)),   // sub0 → code 1 (9 vs 10), sub1 → code 0
      (3L, Array(2.0f, 8.0f))    // sub0 → code 0, sub1 → code 1
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqSeedCodebook(d, "vec_id", "embedding", 2, 1, 2)
    val codes = Similarity.pqEncode(d, "vec_id", "embedding", cb, 2, 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(1, 1))
    assert(codes(2L) == Seq(1, 0) && codes(3L) == Seq(0, 1))
    // query = v2; ADC(v3) = d2(9, cw0=0)+d2(1, cw1=10) = 81+81=162 vs
    // ADC via codes of v3 (0,1): d2(9,0)+d2(1,10) = 81+81
    val top = Similarity.pqTopK(d.filter($"vec_id" === 2L),
      Similarity.pqEncode(d, "vec_id", "embedding", cb, 2, 1),
      "vec_id", "embedding", cb, 2, 1, k = 3)
      .orderBy("rank").collect()
    // neighbor reconstructions: v0→(0,0): 81+1=82e6; v1→(10,10):
    // 1+81=82e6 (tie → lower id first); v3→(0,10): 81+81=162e6
    assert(top.map(_.getLong(2)).toSeq == Seq(0L, 1L, 3L))
    assert(top.map(_.getLong(3)).toSeq ==
      Seq(82000000L, 82000000L, 162000000L))
  }

  test("pq null vectors are excluded, not crashed on") {
    val d = Seq((0L, Some(Array(1.0f, 2.0f))), (1L, None),
      (2L, Some(Array(3.0f, 4.0f))))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqSeedCodebook(
      d.filter($"embedding".isNotNull), "vec_id", "embedding", 2, 1, 2)
    val codes = Similarity.pqEncode(d, "vec_id", "embedding", cb, 2, 1)
    assert(codes.select("vec_id").as[Long].collect().toSet == Set(0L, 2L))
    val top = Similarity.pqTopK(d, codes, "vec_id", "embedding",
      cb, 2, 1, k = 5)
    assert(top.select("query_id").distinct().as[Long].collect().toSet ==
      Set(0L, 2L), "null-vector queries produce no rows, no ANSI error")
  }

  test("pq ties in encode break to the lowest code") {
    // both codewords identical → every vector must take code 0
    val d = Seq((0L, Array(1.0f)), (1L, Array(1.0f)), (2L, Array(5.0f)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqSeedCodebook(d, "vec_id", "embedding", 1, 1, 2)
    val codes = Similarity.pqEncode(d, "vec_id", "embedding", cb, 1, 1)
      .collect().map(r => r.getSeq[Int](1).head)
    assert(codes.forall(_ == 0))
  }

  test("ivfPqTopK ≡ pqTopK restricted to the query's cell, equi-join plan") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = Similarity.pqSeedCodebook(e, "vec_id", "embedding", 8, 8, 16)
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb, 8, 8)
      .join(e.select("vec_id", "label"), "vec_id")
    val qs = e.filter($"vec_id" % 50 === 0)
    val ivf = Similarity.ivfPqTopK(qs, codes, "vec_id", "embedding",
      "label", cb, 8, 8, k = 5)
    // independent restriction: ADC-score ALL candidates with a huge k,
    // then keep same-cell pairs and re-rank driver-side
    val cells = e.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val full = Similarity.pqTopK(qs, codes, "vec_id", "embedding",
        cb, 8, 8, k = 100000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .filter { case (q, n, _) => cells(q) == cells(n) }
      .groupBy(_._1).toSeq.flatMap { case (q, rs) =>
        rs.sortBy { case (_, n, d) => (d, n) }.take(5).zipWithIndex
          .map { case ((_, n, d), i) => (q, i + 1, n, d) }
      }.sortBy(r => (r._1, r._2))
    val got = ivf.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == full)
    // the candidate join must be the broadcast EQUI-join on the cell,
    // never a nested-loop over the whole corpus — and the per-query
    // top-k must execute as the bounded-heap GroupedTopK, not a full
    // per-partition window sort
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(plan.contains("GroupedTopK") && !plan.contains("WindowExec"),
      s"rank tail must heap-execute:\n${plan.take(800)}")
  }

  test("residual PQ quantizes with less ADC error than raw-vector PQ") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cent = e.filter($"vec_id" < 10L)
      .select($"vec_id".as("cluster"),
        $"embedding".cast("array<double>").as("cv"))
    val res = Similarity.residuals(e, "vec_id", "embedding", cent)
      .localCheckpoint()
    val cells = res.select($"vec_id", $"cell")
    val n = e.count().toInt
    // both tiers: trained codebooks of the same budget, same cells,
    // ALL same-cell pairs scored (k = corpus size)
    def adcOf(frame: org.apache.spark.sql.DataFrame, vc: String) = {
      val cb = Similarity.pqTrainCodebook(frame, "vec_id", vc,
        8, 8, 16, iters = 2)
      val codes = Similarity.pqEncode(frame, "vec_id", vc, cb, 8, 8)
        .join(cells, "vec_id")
      Similarity.ivfPqTopK(frame.join(cells, "vec_id")
          .filter($"vec_id" % 50 === 0),
          codes, "vec_id", vc, "cell", cb, 8, 8, k = n)
        .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3)))
        .toMap
    }
    val adcRes = adcOf(res.select($"vec_id", $"rv"), "rv")
    val adcRaw = adcOf(e.select($"vec_id", $"embedding"), "embedding")
    assert(adcRes.keySet == adcRaw.keySet && adcRes.nonEmpty,
      "same cells must yield the same candidate pairs")
    // truth: within a shared cell the residual L2 IS the raw L2
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2sq(a: Long, b: Long): Double =
      vecs(a).zip(vecs(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    def meanErr(adc: Map[(Long, Long), Long]): Double =
      adc.map { case ((q, x), d) =>
        math.abs(d / 1e6 - l2sq(q, x)) }.sum / adc.size
    val (er, ep) = (meanErr(adcRes), meanErr(adcRaw))
    assert(er <= ep,
      f"residual ADC error $er%.3f must not exceed raw ADC error $ep%.3f")
  }

  test("pq trained codebook: recall vs exact L2 top-k on real embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = Similarity.pqTrainCodebook(e, "vec_id", "embedding",
      8, 8, 32, iters = 3)
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb, 8, 8)
    val qs = e.filter($"vec_id" % 50 === 0)
    val K = 10
    val Cand = 50 // ADC candidate-set size for the rescore tier
    val pq = Similarity.pqTopK(qs, codes, "vec_id", "embedding", cb, 8, 8,
        k = Cand)
      .select("query_id", "rank", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)) }
    // exact squared-L2 top-K per query (driver-side brute force over
    // the small sf0.01 corpus — the ground truth, not the operator)
    val all = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => (a(i) - b(i)).toDouble * (a(i) - b(i))).sum
    val queries = all.filter(_._1 % 50 == 0)
    val (direct, cand) = queries.map { case (qid, qv) =>
      val exact = all.filter(_._1 != qid)
        .sortBy { case (id, v) => (l2(qv, v), id) }.take(K).map(_._1).toSet
      ((pq(qid).take(K).toSet & exact).size.toDouble / K,
        (pq(qid).toSet & exact).size.toDouble / K)
    }.unzip
    val meanDirect = direct.sum / direct.length
    val meanCand = cand.sum / cand.length
    // 8-byte codes on 64-dim noise-heavy synthetic embeddings: direct
    // ADC recall@10 is modest (measured ~0.35; random floor 10/499 ≈
    // 0.02) — at scale PQ is the CANDIDATE tier before exact rescore
    // (cf int8Rescore), so the load-bearing number is recall of the
    // exact top-10 inside the ADC top-50 candidate set.
    assert(meanDirect >= 0.25, s"mean direct recall@10 = $meanDirect")
    assert(meanCand >= 0.6, s"mean recall@10-in-top-$Cand = $meanCand")
  }
}
