package graft.operators

import graft.SparkSpec

/** Pins the driver-local BPE trainer ([[TextOps.bpeTrainLocal]]) to the
  * distributed merge loop ([[TextOps.bpeTrain]]) — bit-equal merge
  * tables and segmentations — and proves the local loop scales to a
  * production-sized merge count (a regime where the distributed loop
  * would be ~10³ sequential Spark jobs).
  */
class BpeLocalSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

  test("local trainer ≡ distributed loop: merge table (8 merges)") {
    val dist = TextOps.bpeTrain(docs, "text", numMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = TextOps.bpeTrainLocal(docs, "text", numMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(local.toSeq == dist.toSeq)
  }

  test("local trainer ≡ distributed loop: segmentation table (8 merges)") {
    val dist = TextOps.bpeSegmentation(docs, "text", numMerges = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val local = TextOps.bpeSegmentationLocal(docs, "text", numMerges = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(local.toSeq == dist.toSeq)
  }

  test("local trainer ≡ distributed loop: encode counts (8 merges)") {
    val dist = TextOps.bpeEncodeCounts(docs, "doc_id", "text", numMerges = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val local = TextOps
      .bpeEncodeCountsLocal(docs, "doc_id", "text", numMerges = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(local.toSeq == dist.toSeq)
  }

  test("bigramLmScore: hand-computed add-one ppm on a tiny fixture") {
    import spark.implicits._
    val d = Seq((1L, "a b a"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    // train corpus: tokens a,b,a,a,b,c → c1: a=3 b=2 c=1; V=3
    // bigrams: doc1 (a,b),(b,a); doc2 (a,b) → c2: (a,b)=2, (b,a)=1
    // p(a,b) = 10^6·3 div (3+3) = 500000 ; p(b,a) = 10^6·2 div (2+3) = 400000
    val r = TextOps.bigramLmScore(d, d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(1L) == ((2L, 900000L, 450000L)))
    assert(r(2L) == ((1L, 500000L, 500000L)))
    assert(!r.contains(3L), "single-token docs have no bigrams to score")
    // cross-corpus: unseen bigram/prev falls back to +1 / V smoothing
    val unseen = Seq((9L, "x y")).toDF("doc_id", "text")
    val u = TextOps.bigramLmScore(d, unseen, "doc_id", "text").collect().head
    // c2(x,y)=0, c1(x)=0 → 10^6·1 div (0+3) = 333333
    assert(u.getLong(2) == 333333L)
  }

  test("lmQualityBuckets: CCNet head/middle/tail by descending fluency") {
    import spark.implicits._
    val d = Seq((1L, "a b a", "g"), (2L, "a b", "g"), (4L, "b a", "g"))
      .toDF("doc_id", "text", "source")
    // c1: a=4 b=3, V=2; p(a,b)=10^6·3 div 6=500000; p(b,a)=10^6·3 div 5=600000
    // avg: d1=550000, d2=500000, d4=600000 → desc order d4, d1, d2
    val ntileForm = TextOps.lmQualityBuckets(d, d, "doc_id", "text",
      "source", exactNtile = true)
      .collect().map(x => x.getLong(0) -> x.getInt(4)).toMap
    assert(ntileForm == Map(4L -> 1, 1L -> 2, 2L -> 3))
    // default (quantile-cutoff) form: same buckets on this fixture
    val cutoffForm = TextOps.lmQualityBuckets(d, d, "doc_id", "text",
      "source")
      .collect().map(x => x.getLong(0) -> x.getInt(4)).toMap
    assert(cutoffForm == ntileForm)
  }

  test("lmQualityBuckets cutoff form: monotone tiers, ties share buckets") {
    // real corpus: the windowless form must (a) keep the tier
    // invariant — every doc in bucket b scores ≥ every doc in b+1
    // within its group, (b) never split equal scores across buckets,
    // (c) populate all k buckets for groups with ≥ k distinct scores
    val docsWithSource = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val rows = TextOps.lmQualityBuckets(docsWithSource, docsWithSource,
      "doc_id", "text", "source" /* default form */)
      .select("source", "avg_ppm", "bucket")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      // (b) equal scores never straddle a boundary
      g.groupBy(_._2).foreach { case (ppm, docs2) =>
        assert(docs2.map(_._3).distinct.length == 1,
          s"$src: score $ppm split across buckets")
      }
      // (a) bucket floors are monotone: min of bucket b ≥ max of b+1
      val byBucket = g.groupBy(_._3).view
        .mapValues(v => (v.map(_._2).min, v.map(_._2).max)).toMap
      byBucket.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(hi, lo) =>
          assert(byBucket(hi)._1 >= byBucket(lo)._2,
            s"$src: bucket $hi floor ${byBucket(hi)._1} below bucket " +
              s"$lo ceiling ${byBucket(lo)._2}")
        case _ => ()
      }
      // (c) three tiers materialize on real per-source score spreads
      if (g.map(_._2).distinct.length >= 3)
        assert(byBucket.keySet == Set(1, 2, 3),
          s"$src: expected all 3 buckets, got ${byBucket.keySet}")
    }
  }

  test("1000-merge local training: zero Spark jobs in the merge loop, bounded work") {
    // the sf corpora draw from a small fixed word pool and exhaust
    // after ~90 merges, so build a deterministic 30k-word vocabulary
    // (hex digests: 16-symbol alphabet, deep pair structure) — the
    // regime where the distributed loop would be 10³ sequential jobs.
    //
    // The gate is WORK-BASED, not wall-clock: the round-5 verdict
    // measured this same train at 56 s in one session and 258 s in
    // another under 32-suite contention — a raw `secs < N` assertion
    // goes red on scheduler luck. What we actually need to prove is
    // (a) the merge loop launches zero Spark jobs and (b) its driver
    // bookkeeping is bounded — both deterministic for a fixed corpus.
    val bigger = spark.range(15000)
      .selectExpr("id AS doc_id",
        "concat(md5(cast(id AS string)), ' ', md5(cast(id + 99991 AS string))) AS text")
    val hist = TextOps.bpeHistogram(bigger, "text")
    spark.sparkContext.setJobGroup("bpe-merge-loop-gate",
      "BpeLocalSpec zero-job gate", interruptOnCancel = false)
    val t0 = System.nanoTime()
    val (merges, _, stats) =
      try TextOps.bpeMergeLoop(hist, numMerges = 1000)
      finally spark.sparkContext.clearJobGroup()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1000-merge local training: $secs%.1f s, ${merges.length} merges, $stats")
    val loopJobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup("bpe-merge-loop-gate")
    assert(loopJobs.isEmpty,
      s"merge loop must run zero Spark jobs, saw ${loopJobs.length}")
    // corpus may exhaust all pairs before 1000 rounds — that is the
    // documented stop condition, not a failure
    assert(merges.nonEmpty && merges.length <= 1000)
    val ranks = merges.map(_._1).sorted
    assert(ranks.toSeq == (1 to merges.length).toSeq, "dense ranks")
    // counts never increase with rank within the greedy argmax loop?
    // NOT guaranteed (a merge can create a pair more frequent than the
    // current max), so only sanity-check positivity
    assert(merges.forall(_._4 > 0))
    // bounded bookkeeping: each merge touch shortens a word by ≥ 1
    // token, so a length-L word is rewritten ≤ L-1 times; one rewrite
    // costs ≤ 2L pair updates (retract + re-add) → total ≤ 2 Σ L_w²
    // ≈ 2·maxL × initial pairs. Words here are 32-char digests, so
    // 70× is a safe ceiling with slack — a quadratic regression would
    // blow through it
    assert(stats.pairUpdates <= 70L * stats.initialPairs,
      s"pair updates ${stats.pairUpdates} vs initial ${stats.initialPairs}")
    assert(stats.heapPushes <= stats.initialPairs + stats.pairUpdates,
      "at most one heap push per dirty pair per round")
    assert(stats.heapPops <= stats.heapPushes)
  }

  test("histogram floor and cap bound the collect; capped training well-formed") {
    import spark.implicits._
    // minFreq drops sub-floor words, maxVocab keeps top-N by
    // (freq desc, word) — both applied Spark-side BEFORE the collect,
    // so the driver never materializes an unbounded crawl vocabulary
    val fx = Seq((1L, "aa aa aa ab ab bb"), (2L, "aa aa ab cc"))
      .toDF("doc_id", "text")
    val full = TextOps.bpeHistogram(fx, "text")
    assert(full.toSet ==
      Set(("aa", 5L), ("ab", 3L), ("bb", 1L), ("cc", 1L)))
    val floored = TextOps.bpeHistogram(fx, "text", minFreq = 2L)
    assert(floored.toSet == full.filter(_._2 >= 2L).toSet,
      "floor ≡ filtering the full histogram")
    val capped = TextOps.bpeHistogram(fx, "text", maxVocab = 2)
    assert(capped.toSeq.sortBy(_._1) == Seq(("aa", 5L), ("ab", 3L)),
      "cap ≡ top-N of the full histogram by (freq desc, word)")
    // capped training = BPE over the surviving vocabulary (contract)
    val viaParam = TextOps.bpeTrainLocal(fx, "text", numMerges = 8,
      maxVocab = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val viaHist = TextOps.bpeMergeLoop(capped, 8)._1
    assert(viaParam.toSeq.sortBy(_._1) == viaHist.sortBy(_._1))
    // and the segmentation table covers exactly the surviving words
    val segWords = TextOps.bpeSegmentationLocal(fx, "text", 8, maxVocab = 2)
      .select("word").collect().map(_.getString(0)).toSet
    assert(segWords == Set("aa", "ab"))
  }

  test("default-bounded trainer ≡ exact on a floor-proof fixture; singletons drop") {
    import spark.implicits._
    // every word occurs ≥ 2× and the vocab is tiny, so the BOUNDED
    // defaults (minFreq=2, maxVocab=1M — the r14 flip) see the same
    // histogram as the unbounded oracle path: default ≡ exact
    val fx = Seq((1L, "aa aa ab ab"), (2L, "aa ab bb bb"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(rows(TextOps.bpeTrainLocal(fx, "text", numMerges = 8)) ==
      rows(TextOps.bpeTrainExact(fx, "text", numMerges = 8)),
      "bounded defaults must equal exact when the floor/cap don't bind")
    // and when the floor DOES bind, defaults train on the ≥2 vocabulary
    // only (the documented contract), while exact sees the singleton
    val fy = Seq((1L, "aa aa zq")).toDF("doc_id", "text")
    val defWords = TextOps.bpeSegmentationLocal(fy, "text", 8)
      .select("word").as[String].collect().toSet
    assert(defWords == Set("aa"), s"singleton must drop by default: $defWords")
    val exactWords = TextOps.bpeSegmentationExact(fy, "text", 8)
      .select("word").as[String].collect().toSet
    assert(exactWords == Set("aa", "zq"))
  }

  test("production trainer: cap is mandatory, result ≡ capped local trainer") {
    import spark.implicits._
    val fx = Seq((1L, "aa aa aa ab ab bb"), (2L, "aa aa ab cc"))
      .toDF("doc_id", "text")
    // the guarded entry is exactly the local trainer with a real bound
    val prod = TextOps.bpeTrainProduction(fx, "text", numMerges = 8,
      minFreq = 1L, maxVocab = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = TextOps.bpeTrainLocal(fx, "text", numMerges = 8,
      minFreq = 1L, maxVocab = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(prod.toSeq.sortBy(_._1) == local.toSeq.sortBy(_._1))
    // the unbounded-collect foot-gun is unreachable through this entry
    intercept[IllegalArgumentException] {
      TextOps.bpeTrainProduction(fx, "text", 8, maxVocab = Int.MaxValue)
    }
    intercept[IllegalArgumentException] {
      TextOps.bpeTrainProduction(fx, "text", 8, maxVocab = 0)
    }
    intercept[IllegalArgumentException] {
      TextOps.bpeTrainProduction(fx, "text", 8, minFreq = 0L)
    }
  }

  test("bpeFertility: char-level baseline drops to 1.0 once merges cover") {
    import spark.implicits._
    val d = Seq((1L, "ab c", "s1"), (2L, "ab ab", "s2"))
      .toDF("doc_id", "text", "source")
    // zero merges → every word splits to characters (exact bounds:
    // this fixture's singleton 'c' must stay in the vocabulary — the
    // bounded DEFAULT would drop it, which the default-vs-exact test
    // above pins separately)
    val base = TextOps.bpeFertility(d, "doc_id", "text", "source", 0,
        minFreq = 1L, maxVocab = Int.MaxValue)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(base.toSeq == Seq(("s1", 2L, 3L, 1.5), ("s2", 2L, 4L, 2.0)),
      s"got ${base.toSeq}")
    // enough merges to fuse 'ab' → fertility collapses to 1.0
    val merged = TextOps.bpeFertility(d, "doc_id", "text", "source", 8,
        minFreq = 1L, maxVocab = Int.MaxValue)
      .orderBy("source").collect().map(r => r.getDouble(4))
    assert(merged.toSeq == Seq(1.0, 1.0), s"got ${merged.toSeq}")
  }
}
