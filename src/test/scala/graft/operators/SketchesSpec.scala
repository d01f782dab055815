package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch guarantees the oracle can't express: HLL error bounds on
  * known cardinalities, CMS one-sided error, JL norm preservation,
  * and the zero-shuffle plan shape of the row-local projection.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def keyed(groups: Int, perGroup: Int) =
    (0 until groups).flatMap(g =>
      (0 until perGroup).map(i => (s"g$g", s"key_${g}_$i")))
      .toDF("grp", "key")

  test("HLL estimate lands within 3 standard errors on known cardinalities") {
    // sigma = 1.04/sqrt(64) = 13 %; 3 sigma = 39 %
    val df = keyed(groups = 3, perGroup = 5000)
      // duplicate every key 3x: cardinality must not change
      .union(keyed(3, 5000)).union(keyed(3, 5000))
    val est = Sketches.hllDistinct(df, "grp", "key")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est.size == 3)
    est.foreach { case (g, e) =>
      assert(math.abs(e - 5000) / 5000.0 < 0.39,
        s"$g: estimate $e vs true 5000 outside 3 sigma")
    }
  }

  test("HLL is deterministic and duplicate-insensitive") {
    val df = keyed(2, 800)
    val once = Sketches.hllDistinct(df, "grp", "key").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    val dup = Sketches.hllDistinct(df.union(df), "grp", "key").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(once == dup)
  }

  test("CMS never underestimates, and is exact for a dominant heavy hitter") {
    // heavy token appears 2000x, 500 rare tokens once each: the heavy
    // counter can only be inflated by rare collisions (width 256,
    // depth 4 -> min over rows removes almost all), never deflated
    val toks = (Seq.fill(2000)("heavy") ++
      (0 until 500).map(i => s"rare_$i")).toDF("tok")
    val sketch = Sketches.cmsSketch(toks, "tok")
    val truth = toks.groupBy("tok").agg(count(lit(1)).as("n_true"))
    val est = Sketches.cmsEstimate(sketch, truth, "tok")
      .join(truth, "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length == 501)
    est.foreach { case (tok, n_est, n_true) =>
      assert(n_est >= n_true, s"$tok: CMS underestimated $n_est < $n_true")
    }
    // min-over-4-rows estimate error is bounded by the worst row's
    // collision mass; with 2500 tokens over width 256 that is small
    val (_, heavyEst, heavyTrue) = est.find(_._1 == "heavy").get
    assert(heavyEst - heavyTrue <= 40,
      s"heavy hitter estimate drifted: $heavyEst vs $heavyTrue")
  }

  test("sketch state is bounded: <= 64 registers/group, <= depth*width counters") {
    val df = keyed(2, 3000)
    assert(Sketches.hllRegisters(df, "grp", "key")
      .groupBy("grp").count().collect().forall(_.getLong(1) <= 64))
    assert(Sketches.cmsSketch(df.select(col("key").as("tok")), "tok").count()
      <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
  }

  test("random projection: signs are balanced and rows match projComponent") {
    val signs = for (j <- 0 until 16; i <- 0 until 64)
      yield Similarity.projComponent(j, i)
    assert(signs.forall(s => s == 1 || s == -1))
    val mean = signs.sum.toDouble / signs.length
    assert(math.abs(mean) < 0.15, s"sign matrix biased: mean $mean")
    // one-hot input vector e_i projects to column i of the sign matrix
    val oneHot = Seq((1L, (0 until 64).map(d =>
      if (d == 5) 1.0f else 0.0f).toArray)).toDF("vec_id", "embedding")
    val row = Similarity.randomProject(oneHot, "embedding", 64, 16)
      .select("proj").head().getSeq[Double](0)
    (0 until 16).foreach(j =>
      assert(row(j) == Similarity.projComponent(j, 5).toDouble))
  }

  test("random projection preserves norms within JL tolerance on real embeddings") {
    val e = graft.model.Tables.embeddings(spark, sf)
    val proj = Similarity.randomProject(e, "embedding", 64, 16)
    val ratios = proj.select(
        (Similarity.dot(col("proj"), col("proj")) / 16.0).as("pn"),
        Similarity.dot(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")).as("fn"))
      .filter(col("fn") > 0)
      .select((col("pn") / col("fn")).as("r")).as[Double].collect()
    assert(ratios.nonEmpty)
    // E[|Pv|^2/k] = |v|^2; k=16 gives sqrt(2/16) ~ 35 % std dev —
    // check the MEAN ratio concentrates near 1 and no pathological rows
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean norm ratio $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0))
  }

  test("random projection is row-local: no exchange in the plan") {
    val e = graft.model.Tables.embeddings(spark, sf)
    val plan = Similarity.randomProject(e, "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
  }

  /** Two groups with a KNOWN overlap: a 0..999, b 500..1499 →
    * union 1500, Jaccard 1/3. Above-k estimator path.
    */
  private def overlapped = {
    val a = (0 until 1000).map(i => ("a", s"key_$i"))
    val b = (500 until 1500).map(i => ("b", s"key_$i"))
    (a ++ b).toDF("grp", "key")
  }

  test("KMV sketch keeps at most k ranked ascending hashes per group") {
    val sk = Sketches.kmvSketch(overlapped, "grp", "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byG = sk.groupBy(_._1)
    assert(byG.keySet == Set("a", "b"))
    byG.values.foreach { rows =>
      assert(rows.length == Sketches.KmvK)
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
        "rank order must equal ascending hash order")
    }
  }

  test("KMV overlap: exact columns exact; estimates inside 3-sigma") {
    val row = Sketches.kmvOverlap(overlapped, "grp", "key").head()
    assert(row.getAs[String]("ga") == "a" && row.getAs[String]("gb") == "b")
    assert(row.getAs[Long]("exact_common") == 500L)
    assert(row.getAs[Long]("exact_union") == 1500L)
    assert(row.getAs[Double]("exact_jaccard") == 0.333333)
    // KMV union rel. error ~ 1/sqrt(k-2) = 12.7 %; 3 sigma = 38 %
    val estU = row.getAs[Double]("kmv_union")
    assert(math.abs(estU - 1500) / 1500.0 < 0.38, s"union est $estU")
    // Jaccard sampling error sqrt(J(1-J)/k) = 5.9 %; 3 sigma = 18 %
    val estJ = row.getAs[Double]("kmv_jaccard")
    assert(math.abs(estJ - 1.0 / 3) < 0.18, s"jaccard est $estJ")
  }

  test("sketches are mergeable: shard sketches combine to the whole-data sketch") {
    val whole = keyed(groups = 4, perGroup = 700)
    // HLL: per-group registers max-merged == registers of the pooled
    // data sketched directly, bit-for-bit (max is associative +
    // idempotent — any merge tree gives the same registers)
    val perGroup = Sketches.hllMergeRegisters(
      Sketches.hllRegisters(whole, "grp", "key"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val direct = Sketches.hllRegisters(
      whole.withColumn("one", lit("all")), "one", "key")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(perGroup == direct)
    // CMS: counters of two halves SUM to the whole-data counters
    val (h1, h2) = (whole.filter($"key".endsWith("1")),
      whole.filter(!$"key".endsWith("1")))
    def cmsMap(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsSketch(df, "key").collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val summed = (cmsMap(h1).keySet ++ cmsMap(h2).keySet).map(k =>
      k -> (cmsMap(h1).getOrElse(k, 0L) + cmsMap(h2).getOrElse(k, 0L))).toMap
    assert(summed == cmsMap(whole))
    // KMV: k smallest of (sketch(h1) ∪ sketch(h2)) == sketch(whole)
    def kmvSet(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvSketch(df.withColumn("one", lit("all")), "one", "key")
        .select("hv").as[Long].collect().toSet
    val mergedKmv = (kmvSet(h1) ++ kmvSet(h2)).toSeq.sorted
      .take(Sketches.KmvK).toSet
    assert(mergedKmv == kmvSet(whole))
  }

  test("KMV overlap is EXACT below k distinct values, and duplicate-insensitive") {
    val a = (0 until 30).map(i => ("a", s"k$i"))
    val b = (20 until 50).map(i => ("b", s"k$i"))
    val df = (a ++ b ++ a ++ b).toDF("grp", "key") // dups must not matter
    val row = Sketches.kmvOverlap(df, "grp", "key").head()
    assert(row.getAs[Long]("exact_common") == 10L)
    assert(row.getAs[Long]("exact_union") == 50L)
    // union (50) below k=64: the merged sketch holds EVERY value, so
    // the estimate is the exact count and the sample Jaccard is exact
    assert(row.getAs[Double]("kmv_union") == 50.0)
    assert(row.getAs[Double]("kmv_jaccard") == 0.2)
  }

  test("log histogram buckets: 0→0, [2^(b-1),2^b)→b, exact boundaries") {
    val d = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L)
      .map(("g", _)).toDF("grp", "v")
    val got = Sketches.logHistogram(d, "grp", "v")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // 0→b0; 1→b1; 2,3→b2; 4,7→b3; 8→b4; 1023→b10; 1024→b11
    assert(got == Map(0 -> 1L, 1 -> 1L, 2 -> 2L, 3 -> 2L, 4 -> 1L,
      10 -> 1L, 11 -> 1L), s"got $got")
  }

  test("log quantile bounds sandwich the exact order statistic") {
    // real doc lengths per source: lo ≤ exact p-th ≤ hi for all p
    val docs = graft.model.Tables.documents(spark, sf)
      .select($"source", $"n_chars")
    val bounds = Sketches.logQuantileBounds(docs, "source", "n_chars")
      .collect()
      .map(r => r.getString(0) -> r).toMap
    val bySource = docs.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((src, vals) <- bySource; p <- Seq(50, 90, 99)) {
      val exact = vals((math.ceil(vals.size * p / 100.0) - 1).toInt.max(0))
      val r = bounds(src)
      val lo = r.getAs[Long](s"p${p}_lo")
      val hi = r.getAs[Long](s"p${p}_hi")
      assert(lo <= exact && exact <= hi,
        s"$src p$p: exact $exact outside [$lo, $hi]")
      assert(hi < 2 * lo.max(1) * 2, s"bucket width is one octave: $lo..$hi")
    }
  }

  test("log histograms merge by SUM: shard histograms == whole histogram") {
    val d = (1 to 500).map(i => ("g", (i * 37 % 1000).toLong))
      .toDF("grp", "v")
    val whole = Sketches.logHistogram(d, "grp", "v")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    val shardA = d.filter(pmod(hash($"v"), lit(2)) === 0)
    val shardB = d.filter(pmod(hash($"v"), lit(2)) === 1)
    val merged = Sketches.logHistogram(shardA, "grp", "v")
      .unionByName(Sketches.logHistogram(shardB, "grp", "v"))
      .groupBy("grp", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(merged == whole, s"merged $merged != whole $whole")
  }

  test("quantileSketch: shard merge ≡ direct sketch, content and estimates") {
    val docs = graft.model.Tables.documents(spark, sf)
      .filter($"n_chars".isNotNull)
    val direct = Sketches.quantileSketch(docs, "source", "doc_id",
      "n_chars", m = 32)
    val shardA = Sketches.quantileSketch(
      docs.filter($"doc_id" % 2 === 0), "source", "doc_id", "n_chars", m = 32)
    val shardB = Sketches.quantileSketch(
      docs.filter($"doc_id" % 2 =!= 0), "source", "doc_id", "n_chars", m = 32)
    val merged = Sketches.quantileSketchMerge(shardA, shardB, "source", m = 32)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("source", "hv", "key", "v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.get(2).toString, r.get(3).toString)).toSet
    assert(rows(merged) == rows(direct),
      "merged sketch content must equal the direct sketch exactly")
    def ests(sk: org.apache.spark.sql.DataFrame) =
      Sketches.sketchQuantiles(sk, "source").collect()
        .map(r => (r.getString(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(ests(merged) == ests(direct))
  }

  test("quantileSketch: exact when the group fits in m") {
    val d = (1 to 100).map(i => ("g", i.toLong, (i * 37 % 1000).toLong))
      .toDF("grp", "id", "v")
    val est = Sketches.sketchQuantiles(
      Sketches.quantileSketch(d, "grp", "id", "v", m = 200), "grp")
      .head()
    // with every row sampled, the estimate IS the order statistic
    val sorted = (1 to 100).map(i => (i * 37 % 1000).toLong).sorted
    def exact(p: Int) = sorted((p * 100 / 100.0).ceil.toInt - 1)
    assert((est.getLong(1), est.getLong(2), est.getLong(3)) ==
      (exact(50), exact(90), exact(99)),
      s"n <= m must be exact, got $est")
  }

  test("quantileSketch: rank error within the Hoeffding bound on real data") {
    // m = 64 → ε = sqrt(ln(2/δ)/(2m)) ≈ 0.215 at δ = 0.01; the data
    // and hash are fixed so the measured error is deterministic
    val m = 64
    val eps = math.sqrt(math.log(2 / 0.01) / (2.0 * m))
    val docs = graft.model.Tables.documents(spark, sf)
      .filter($"n_chars".isNotNull)
    val est = Sketches.sketchQuantiles(
      Sketches.quantileSketch(docs, "source", "doc_id", "n_chars", m),
      "source")
    val all = docs.select($"source", $"n_chars".cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    est.collect().foreach { r =>
      val vals = all(r.getString(0))
      val n = vals.size
      for ((p, i) <- Seq(50, 90, 99).zipWithIndex) {
        val v = r.getLong(1 + i)
        // estimate's rank interval in the full data vs target rank
        val lo = vals.count(_ < v) + 1
        val hi = vals.count(_ <= v)
        val target = math.ceil(n * p / 100.0).toInt
        val err =
          if (target >= lo && target <= hi) 0.0
          else math.min(math.abs(target - lo), math.abs(target - hi)) / n.toDouble
        assert(err <= eps,
          s"${r.getString(0)} p$p: rank error $err exceeds ε=$eps (n=$n)")
      }
    }
  }

  test("sketchKsDrift: identical sketches give exactly 0; estimate tracks exact KS") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"n_chars".isNotNull)
    val m = 64
    // block split: source = id mod 20 in the harness data, so id
    // PARITY is degenerate (one empty slice per source)
    val ska = Sketches.quantileSketch(
      docs.filter(expr("(doc_id div 20) % 2 = 0")),
      "source", "doc_id", "n_chars", m)
    val skb = Sketches.quantileSketch(
      docs.filter(expr("(doc_id div 20) % 2 = 1")),
      "source", "doc_id", "n_chars", m)
    // self-comparison: observed == expected at every value → D = 0
    val self = Sketches.sketchKsDrift(ska, ska, "source")
      .collect().map(_.getLong(3))
    assert(self.forall(_ == 0L), self.mkString(", "))
    // sketch estimate vs exact two-sample KS on the raw halves: each
    // sketch is a uniform m-sample, so the error is bounded by the
    // two Hoeffding radii (√(ln(2/δ)/2m) each ≈ 0.20 at m=64, δ=1%)
    // a tiny fixture source can be all-even or all-odd (one slice
    // empty → null KS on BOTH paths) — compare the defined groups
    def ksMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .flatMap(r => Option(r.get(3))
        .map(v => r.getString(0) -> v.asInstanceOf[Long])).toMap
    val est = ksMap(Sketches.sketchKsDrift(ska, skb, "source"))
    val exact = ksMap(graft.operators.Features.ksDrift(
      docs.withColumn("__h",
        when(expr("(doc_id div 20) % 2 = 0"), "a").otherwise("b")),
      "source", "__h", "a", "b", "n_chars"))
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (src, e) =>
      assert(math.abs(e - exact(src)) <= 400000L,
        s"$src: sketch KS $e vs exact ${exact(src)}")
    }
  }

  test("hllSlidingDistinct: window merge ≡ sketching the window's union") {
    val rows = (0 until 10).flatMap { d =>
      (0 until 200).map(i =>
        (java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
          s"u${d * 150 + i}"))
    }.toDF("ts", "k")
    val got = Sketches.hllSlidingDistinct(rows, "ts", "k", 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // 200 keys/day with 50 overlapping into the next day: a full
    // 3-day window holds 200 + 150 + 150 = 500 distinct keys
    assert(got("2024-01-05")._1 == 500L, got("2024-01-05").toString)
    // ragged leading edge: day 1's window is just itself
    assert(got("2024-01-01")._1 == 200L)
    // the mergeability contract: the day's estimate equals hllDistinct
    // over EXACTLY the window's rows (max-merged registers ≡ registers
    // of the union)
    val windowRows = rows
      .filter(col("ts").between("2024-01-03 00:00:00", "2024-01-05 23:59:59"))
      .select(lit("g").as("g"), col("k"))
    val direct = Sketches.hllDistinct(windowRows, "g", "k")
      .head.getDouble(1)
    assert(got("2024-01-05")._2 == direct,
      s"window-merged ${got("2024-01-05")._2} vs direct $direct")
  }

  test("amsJoinSize: exact companion correct; collision-free est is exact") {
    // g1 ⋈ g2 on key: x contributes 2·1, y contributes 1·2 → 4
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "x"), ("g2", "y"), ("g2", "y"), ("g2", "z")).toDF("g", "k")
    val r = Sketches.amsJoinSize(df, "g", "k").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("exact_join_size") == 4L)
    // 3 distinct keys in 256 buckets: no collision (deterministic md5
    // layout, verified) → the sign products telescope to the truth
    assert(r.head.getAs[Long]("ams_est") == 4L)
  }

  test("amsSketch merges: shard sketches SUM into the corpus sketch") {
    val full = keyed(groups = 2, perGroup = 400)
    val shardA = full.filter(expr("substring(key, -1) in ('0','1','2','3','4')"))
    val shardB = full.exceptAll(shardA)
    val merged = Sketches.amsSketch(shardA, "grp", "key")
      .unionByName(Sketches.amsSketch(shardB, "grp", "key"))
      .groupBy("grp", "b").agg(sum("xv").as("xv"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val direct = Sketches.amsSketch(full, "grp", "key")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // bucket-wise identical, modulo buckets whose signs cancel to 0
    assert(merged.filter(_._2 != 0L) == direct.filter(_._2 != 0L))
  }
}
