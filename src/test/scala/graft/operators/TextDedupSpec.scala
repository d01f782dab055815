package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup (1 word)
    (4L, "completely different content about spark engines and shuffles"),
  ).toDF("doc_id", "text")

  test("languageId: english markers win, no markers → und") {
    val r = Seq(("a", "the cat and the dog of the house"),
      ("b", "zzz qqq xxx")).toDF("id", "text")
      .select($"id", TextOps.languageId($"text").as("lang"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r("a") == "en")
    assert(r("b") == "und")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fps = Seq((1L, "alpha beta gamma"), (2L, "beta alpha gamma"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
      .select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(3L), "same text, same fingerprint")
    assert(fps(1L) != fps(2L), "word order must change the fingerprint")
  }

  test("quality ratios on a known doc") {
    val row = TextOps.withQuality(Seq((1L, "the the cat!")).toDF("doc_id", "text"), "text")
      .select("n_tokens", "distinct_ratio", "stopword_ratio", "non_alnum_ratio")
      .head()
    assert(row.getInt(0) == 3)
    assert(math.abs(row.getDouble(1) - 2.0 / 3) < 1e-6)
    assert(math.abs(row.getDouble(2) - 2.0 / 3) < 1e-6)
    assert(math.abs(row.getDouble(3) - 1.0 / 12) < 1e-6)
  }

  test("lexicalDiversity: exact multiset statistics on known docs") {
    val r = TextOps.lexicalDiversity(
      Seq((1L, "a b b c c c"),   // n=6 V=3 V1=1 S2=14
          (2L, "x"),             // n=1 V=1 V1=1 S2=1
          (3L, "  "),            // empty after tokenize
      ).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(row => row.getLong(0) -> row).toMap
    val d1 = r(1L)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) == ((6L, 3L, 1L)))
    assert(d1.getDouble(4) == 0.5)                  // ttr = 3/6
    assert(d1.getDouble(5) == 0.333333)             // hapax = 1/3
    assert(d1.getDouble(6) == 2222.222222)          // 10^4 * 8/36
    assert(d1.getDouble(7) == 2.571429)             // 36/14
    val d2 = r(2L)
    assert((d2.getLong(1), d2.getLong(2), d2.getLong(3)) == ((1L, 1L, 1L)))
    assert(d2.getDouble(4) == 1.0 && d2.getDouble(5) == 1.0)
    assert(d2.getDouble(6) == 0.0 && d2.getDouble(7) == 1.0)
    val d3 = r(3L)
    assert((d3.getLong(1), d3.getLong(2), d3.getLong(3)) == ((0L, 0L, 0L)))
    assert((4 to 7).forall(d3.isNullAt), "empty doc → null ratios")
  }

  test("lexicalDiversity plans zero exchanges (row-local fold)") {
    val out = TextOps.lexicalDiversity(docs, "doc_id", "text")
    val n = graft.plans.ShuffleAudit.measure(out)
    assert(n.exchanges == 0,
      s"lexical diversity must not shuffle: ${n.exchanges} exchanges")
  }

  test("exact dedup keeps the min-id row per distinct text") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("minhash: identical docs collide on every band, unrelated on none") {
    val sigs = Dedup.minhashSignatures(
      Dedup.docShingles(docs, "doc_id", "text", 3), "doc_id")
    val pairs = Dedup.estimatedJaccard(
      Dedup.lshCandidatePairs(sigs, "doc_id"), sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0, "exact dups must collide on every perm")
    assert(!pairs.contains((1L, 4L)), "unrelated docs must not pair")
    // (1,3) is 0.4-Jaccard — below the 4×4 banding s-curve threshold
    // (1/4)^(1/4) ≈ 0.71, so LSH correctly does NOT owe us that pair.
  }

  test("minhash est_jaccard approximates exact shingle jaccard") {
    val sh = Dedup.docShingles(docs, "doc_id", "text", 3)
    val sigs = Dedup.minhashSignatures(sh, "doc_id")
    // score the explicit pair (not via LSH — candidacy is probabilistic
    // below the banding threshold; estimation accuracy is not)
    val est = Dedup.estimatedJaccard(
      Seq((1L, 3L)).toDF("id_a", "id_b"), sigs, "doc_id")
      .select("est_jaccard").as[Double].head()
    val exact = Dedup.ngramJaccard(
      Seq((1L, 3L)).toDF("id_a", "id_b"), sh, "doc_id")
      .select("jaccard").as[Double].head()
    // 7 shingles each, 4 shared → exact 0.4; 16 perms → est within ~0.35
    assert(math.abs(est - exact) < 0.35, s"est=$est exact=$exact")
  }

  test("simhash: identical docs → hamming 0; near dups closer than unrelated") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashNearDups(sims, "doc_id", maxDist = 60, lit(1))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((1L, 3L)) < pairs((1L, 4L)),
      "near dup must be closer in hamming space than unrelated doc")
  }

  test("ngram jaccard exact values") {
    val sh = Dedup.docShingles(docs, "doc_id", "text", 3)
    val j = Dedup.ngramJaccard(
      Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b"), sh, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) == 0.0)
  }

  test("repetitionStats: exact fractions, null-safe pass flag") {
    val d = Seq(
      (1L, "a b a b a b"), // top bigram "a b" 3/5, degenerate
      (2L, "t01 t02 t03 t04 t05 t06 t07 t08 t09 t10 " +
        "t11 t12 t13 t14 t15 t16 t17 t18 t19 t20"), // all distinct
      (3L, "hello"), // no n-grams at all → null fractions, passes
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(math.abs(r(1L).getDouble(1) - 0.6) < 1e-9) // 3/5
    assert(math.abs(r(1L).getDouble(2) - 0.5) < 1e-9) // 2/4
    assert(r(1L).getDouble(3) == 0.0, "both 5-grams occur exactly once")
    assert(!r(1L).getBoolean(4))
    assert(math.abs(r(2L).getDouble(1) - 1.0 / 19) < 1e-6)
    assert(r(2L).getBoolean(4), "distinct doc passes")
    assert(r(3L).isNullAt(1) && r(3L).getBoolean(4),
      "doc too short for n-grams: null fractions, passes by coalesce")
  }

  test("repetitionPassLocal agrees with the distributed gate on real docs") {
    val real = graft.model.Tables.documents(spark, sf).limit(200)
    val d = TextOps.repetitionStats(real, "doc_id", "text")
      .select("doc_id", "gopher_pass")
    val l = real.select(col("doc_id"),
      TextOps.repetitionPassLocal(col("text")).as("local_pass"))
    val joined = d.join(l, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2),
      s"doc ${r.getLong(0)}: dist=${r.getBoolean(1)} local=${r.getBoolean(2)}"))
    // short doc: no grams at all → passes on both paths
    val short = Seq((1L, "hi")).toDF("doc_id", "text")
      .select(TextOps.repetitionPassLocal(col("text"))).head().getBoolean(0)
    assert(short)
  }

  test("stripBoilerplate removes every frequent-shingle span, keeps the rest") {
    // "common header text" appears in 3 docs → boilerplate at minDocs=3;
    // unique bodies survive; a doc that is ONLY boilerplate → ""
    val d = Seq(
      (1L, "common header text alpha beta gamma"),
      (2L, "common header text delta epsilon"),
      (3L, "common header text"),
      (4L, "nothing shared here at all"),
    ).toDF("doc_id", "text")
    val got = TextOps.stripBoilerplate(d, "doc_id", "text", k = 3,
      minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "alpha beta gamma")
    assert(got(2L) == "delta epsilon")
    assert(got(3L) == "", "all-boilerplate doc must come back empty")
    assert(got(4L) == "nothing shared here at all")
  }

  test("topTerms: deterministic ranking through the GroupedTopK operator") {
    val d = Seq(
      (1L, "alpha alpha beta", "s1"), (2L, "alpha gamma", "s1"),
      (3L, "beta beta beta", "s2"), (4L, "alpha delta", "s2"),
    ).toDF("doc_id", "text", "source")
    val out = TextOps.topTerms(d, "doc_id", "text", "source", k = 2)
    val rows = out.collect()
    assert(out.queryExecution.executedPlan.toString.contains("GroupedTopK "),
      "ranking must route through the heap operator")
    val got = rows.map(r => (r.getString(0), r.getInt(5)) -> r.getString(1))
      .toMap
    // s1: alpha tf=3 df=3 → 3*4/3=4.0; gamma tf=1 df=1 → 4.0; beta
    // tf=1 df=2 → 2.0 — tie at 4.0 breaks on token asc
    assert(got(("s1", 1)) == "alpha" && got(("s1", 2)) == "gamma")
    // s2: beta tf=3 df=2 → 6.0; delta tf=1 df=1 → 4.0; alpha 1*4/3
    assert(got(("s2", 1)) == "beta" && got(("s2", 2)) == "delta")
  }

  test("maintained term stats: refresh ≡ topTerms over the new snapshot; serve never reads docs") {
    val d0 = Seq(
      (1L, "alpha alpha beta", "s1"), (2L, "alpha gamma", "s1"),
      (3L, "beta beta beta", "s2"), (4L, "alpha delta", "s2"),
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tfidf_").toString + "/state"
    TextOps.writeTermStats(d0, "doc_id", "text", "source", dir)
    // CDC: doc 2 updated (gamma→omega), doc 3 deleted, doc 5 added
    val newCorpus = Seq(
      (1L, "alpha alpha beta", "s1"), (2L, "alpha omega", "s1"),
      (4L, "alpha delta", "s2"), (5L, "omega omega", "s2"),
    ).toDF("doc_id", "text", "source")
    TextOps.refreshTermStats(spark, dir,
      removedDocs = Seq((2L, "alpha gamma", "s1"),
        (3L, "beta beta beta", "s2")).toDF("doc_id", "text", "source"),
      addedDocs = Seq((2L, "alpha omega", "s1"),
        (5L, "omega omega", "s2")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", batchId = 1L)
    val served = TextOps.topTermsFromStats(spark, dir, "source", k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5))).toSet
    assert(rows(served) ==
      rows(TextOps.topTerms(newCorpus, "doc_id", "text", "source", k = 3)),
      "maintained serve must equal the from-scratch report, bit-for-bit")
    // the serve reads the three views only — no document scan
    val served2 = TextOps.topTermsFromStats(spark, dir, "source", k = 3)
    val all = graft.plans.ScanAudit.measure(served2)
    val state = graft.plans.ScanAudit.measureFor(served2, "state")
    assert(all.scans > 0 && all.scans == state.scans,
      s"serve must only read the stored views: ${all.scans} scans, " +
        s"${state.scans} under the state dir")
    // replay of batch 1 no-ops on all three views
    TextOps.refreshTermStats(spark, dir,
      removedDocs = Seq((1L, "alpha alpha beta", "s1"))
        .toDF("doc_id", "text", "source"),
      addedDocs = Seq.empty[(Long, String, String)]
        .toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", batchId = 1L)
    assert(rows(TextOps.topTermsFromStats(spark, dir, "source", k = 3)) ==
      rows(served), "batch-id replay must no-op")
  }

  test("term-stats CDC fail-fasts on pending streaming deltas; " +
      "compact-then-delete is exact") {
    // the r14-advice hole: doc X's contributions live ONLY in an
    // unfolded _deltas batch; a CDC delete of X would drive base
    // counts negative, the count>0 clamp would drop the subtraction,
    // and X's terms would resurrect at merge-on-read — so the delete
    // must be REJECTED until compaction folds the delta in.
    val d0 = Seq((1L, "alpha beta", "s1")).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tfidf_guard_").toString + "/state"
    TextOps.writeTermStats(d0, "doc_id", "text", "source", dir)
    val streamed = Seq((2L, "gamma gamma", "s1"))
      .toDF("doc_id", "text", "source")
    TextOps.writeTermStatsDeltaPartial(streamed, 1L,
      "doc_id", "text", "source", dir)
    val del = intercept[IllegalArgumentException] {
      TextOps.refreshTermStats(spark, dir,
        removedDocs = streamed,
        addedDocs = Seq.empty[(Long, String, String)]
          .toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", batchId = 5L)
    }
    assert(del.getMessage.contains("compactDeltas"), del.getMessage)
    // after compacting, the same delete applies and the state equals
    // a from-scratch build over the surviving corpus
    TextOps.compactTermStats(spark, dir, "source")
    TextOps.refreshTermStats(spark, dir,
      removedDocs = streamed,
      addedDocs = Seq.empty[(Long, String, String)]
        .toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", batchId = 5L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5))).toSet
    assert(rows(TextOps.topTermsFromStats(spark, dir, "source", k = 3)) ==
      rows(TextOps.topTerms(d0, "doc_id", "text", "source", k = 3)),
      "compact-then-delete must equal the from-scratch report")
  }

  test("pairEvidence: contiguous runs vs scattered fragments, exact counts") {
    val d = Seq(
      (1L, "a b c d e f"),          // shingles abc bcd cde def
      (2L, "a b c d x e f"),        // shares abc, bcd → one run of 2
      (3L, "z z a b c z z a b c"),  // abc at pos 2 and 7
      (4L, "a b c"),                // abc once
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.pairEvidence(d, "doc_id", "text", pairs, k = 3)
      .orderBy("id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      // (1,2): 2 shared shingles in ONE contiguous run → 4 tokens
      (1L, 2L, 2L, 1L, 4L),
      // (3,4): same 2 matches but on two diagonals → 2 runs, 3 tokens
      (3L, 4L, 2L, 2L, 3L)), s"got ${got.toSeq}")
  }

  test("pairEvidence: duplicate rows in the pairs frame do not inflate counts") {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x e f"),
    ).toDF("doc_id", "text")
    // the same pair delivered three times (e.g. from unioned candidate
    // generators) must yield the SAME evidence row as once
    val dupPairs = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val got = Dedup.pairEvidence(d, "doc_id", "text", dupPairs, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 1L, 4L)), s"got ${got.toSeq}")
  }

  test("collocationsPmi: exact scores, min-count floor, tie on bigram") {
    val d = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // tokens a:3 b:2 c:1 → N=6; bigrams "a b"×2 "b a"×1 "a c"×1 → M=4
    val got = TextOps.collocationsPmi(d, "doc_id", "text", minPair = 1L,
      k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1, "a b", 2L, 3.0),  // 2·36/(3·2)/4 — tie at 3.0 breaks on bigram
      (2, "a c", 1L, 3.0),  // 1·36/(3·1)/4
      (3, "b a", 1L, 1.5)), s"got ${got.toSeq}")
    // the floor kills hapax pairs
    val floored = TextOps.collocationsPmi(d, "doc_id", "text", minPair = 2L,
      k = 10).collect()
    assert(floored.map(_.getString(1)).toSeq == Seq("a b"))
  }

  test("docKeywords: per-doc ranking, df across docs, k bound") {
    val d = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val got = TextOps.docKeywords(d, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, 1, "x", 4.0), (1L, 2, "y", 1.0),   // x: tf2·2/df1; y: tf1·2/df2
      (2L, 1, "z", 2.0), (2L, 2, "y", 1.0)), s"got ${got.toSeq}")
  }

  test("corpusProfileApprox tracks the exact profile within rank tolerance") {
    val docs = graft.model.Tables.documents(spark, sf)
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    val exact = TextOps.corpusProfile(docs, "text", "source")
      .orderBy("source").collect()
    val approx = TextOps.corpusProfileApprox(docs, "text", "source")
      .orderBy("source").collect()
    assert(exact.length == approx.length)
    exact.zip(approx).foreach { case (e, a) =>
      assert(key(e) == key(a))
      // counting aggregates are identical; only the percentiles are
      // sketched (and approx returns an element, exact interpolates)
      assert(e.getAs[Long]("n_docs") == a.getAs[Long]("n_docs"))
      assert(e.getAs[Long]("total_tokens") == a.getAs[Long]("total_tokens"))
      // HLL++ at 2% rsd is exact for language-sized cardinalities
      assert(e.getAs[Long]("n_langs") == a.getAs[Long]("n_langs"))
      for (c <- Seq("p50_tokens", "p90_tokens")) {
        val ev = e.getAs[Double](c)
        val av = a.getAs[Double](c)
        assert(math.abs(av - ev) <= math.max(2.0, ev * 0.1),
          s"$c diverged: approx $av vs exact $ev")
      }
    }
  }

  test("connectedComponents: chains close transitively, singletons self-label") {
    // graph: 1-2, 2-3, 3-4 (a 4-chain: diameter > 1 forces >1 round),
    // 6-7; 5 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L))
      .toDF("id_a", "id_b")
    val verts = (1L to 7L).toDF("id")
    val comps = Dedup.connectedComponents(pairs, verts, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L),
      "chain must collapse to min id even across >1 hop")
    assert(comps(5L) == 5L, "singleton labels itself")
    assert(comps(6L) == 6L && comps(7L) == 6L)
  }

  test("incrementalDedup: drops vs existing sigs and intra-batch, keeps novel") {
    val existing = Seq(
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val existingSigs = Dedup.minhashSignatures(
      Dedup.docShingles(existing, "doc_id", "text", 3, dedup = false), "doc_id")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog"), // dup of corpus
      (13L, "completely novel content about spark shuffles here"),
      (15L, "another brand new document with fresh words inside"),
      (17L, "another brand new document with fresh words inside"), // dup of 15
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, "doc_id", "text", existingSigs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(13L, 15L),
      s"corpus dup and intra-batch dup must drop, got ${kept.toSeq}")
  }

  test("dedupCorpusTransitive keeps one representative per cluster") {
    // 1≈2 exact, 3 near-dup of both → all one cluster; 4 alone
    val kept = Dedup.dedupCorpusTransitive(docs, "doc_id", "text",
      k = 3, threshold = 0.3)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.head == 1L, "cluster keeps its min id")
    assert(kept.contains(4L), "unrelated doc survives")
    assert(!kept.contains(2L), "exact dup removed without a separate pass")
  }

  test("searchTopK: integer tf-idf scores, rare term dominates") {
    val d = Seq(
      (1L, "spark spark spark common"),     // tf(spark)=3
      (2L, "spark common common"),          // tf(spark)=1
      (3L, "common only here"),             // no query terms → absent
      (4L, "unrelated entirely"),
    ).toDF("doc_id", "text")
    val got = TextOps.searchTopK(d, "doc_id", "text", "spark", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // N=4 docs, df(spark)=2 → unit = 4*1000000 div 2 = 2000000
    assert(got.toSeq == Seq((1, 1L, 6000000L), (2, 2L, 2000000L)))
  }

  test("bbit signatures pack the low bit of each permutation minimum") {
    import org.apache.spark.sql.functions.{col, lit}
    // mh_j odd exactly for even j → bsig = 0b0101...01 = 0x5555
    val row = (0 until 16).map(j => if (j % 2 == 0) 3L else 4L)
    val sigs = Seq(Tuple1(1L)).toDF("doc_id")
      .select(col("doc_id") +: row.zipWithIndex.map {
        case (v, j) => lit(v).as(s"mh$j") }: _*)
    val got = Dedup.bbitSignatures(sigs, "doc_id").head
    assert(got.getInt(1) == 0x5555, s"got ${got.getInt(1).toHexString}")
  }

  test("bbit estimate: 1 for identical sigs, 1 - diff/8 otherwise") {
    import org.apache.spark.sql.functions.{col, lit}
    def sig(id: Long, mh: Seq[Long]) =
      Seq(Tuple1(id)).toDF("doc_id")
        .select(col("doc_id") +: mh.zipWithIndex.map {
          case (v, j) => lit(v).as(s"mh$j") }: _*)
    val base = (0 until 16).map(_ => 2L) // all even → bits 0
    // doc 2 flips the low bit of 4 permutations → diff 4 → est 0.5
    val four = base.updated(0, 3L).updated(1, 5L)
      .updated(2, 7L).updated(3, 9L)
    val sigs = sig(1L, base).unionByName(sig(2L, base))
      .unionByName(sig(3L, four))
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.bbitJaccard(pairs, sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got((1L, 2L)) == 1.0, s"identical bits → 1.0: $got")
    assert(got((1L, 3L)) == 0.5, s"4 differing bits → 1 - 4/8: $got")
  }

  test("bbit estimate agrees with the full signature on exact dups") {
    // real docs: every candidate pair the FULL signatures call exact
    // (est_jaccard = 1) must also be exact under 1-bit signatures
    val sigs = Dedup.minhashSignatures(
      Dedup.docShingles(graft.model.Tables.documents(spark, sf),
        "doc_id", "text", 3, dedup = false), "doc_id").localCheckpoint()
    val scored = Dedup.bbitJaccard(
      Dedup.estimatedJaccard(
        Dedup.lshCandidatePairs(sigs, "doc_id"), sigs, "doc_id"),
      sigs, "doc_id")
    val exact = scored.filter($"est_jaccard" === 1.0)
    assert(exact.count() > 0, "fixture has exact dups")
    assert(exact.filter($"bbit_est" =!= 1.0).count() == 0,
      "equal signatures must have equal bits")
  }

  test("bm25TopK: tf saturates (4x occurrences is not 4x score)") {
    // equal doc lengths isolate the saturation term. N=2, T=8,
    // df(spark)=2 → idf = 1e6; tfsat = 44000·T·tf // (20·T·tf + 6·T
    // + 18·dl·N): tf=1 → 352000//352 = 1000, tf=4 → 1408000//832 =
    // 1692 — 4x the occurrences, 1.69x the score
    val d = Seq(
      (1L, "spark a a a"),
      (2L, "spark spark spark spark"),
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(d, "doc_id", "text", "spark", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> 1000000000L, 2L -> 1692000000L), s"got $got")
  }

  test("bm25TopK: length normalization favors the shorter doc at equal tf") {
    // N=2, T=10, idf = 1e6; dl=2 → 440000//332 = 1325, dl=8 →
    // 440000//548 = 802
    val d = Seq(
      (1L, "spark b"),
      (2L, "spark b b b b b b b"),
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(d, "doc_id", "text", "spark", k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 1L, 1325000000L), (2, 2L, 802000000L)),
      s"got ${got.toSeq}")
  }

  test("lshCurve: monotone S-curves, extremes behave, current config flagged") {
    val rows = Dedup.lshCurve(spark).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows.length == 5 * 19, "5 divisor configs x 19 jaccard levels")
    // per config, P(candidate) is non-decreasing in jaccard
    rows.groupBy(_._1).foreach { case (cfg, rs) =>
      val ps = rs.sortBy(_._2).map(_._3)
      assert(ps.zip(ps.tail).forall { case (a, b) => b >= a }, s"$cfg")
    }
    // b=16,r=1 is the permissive extreme; b=1,r=16 the strict one
    val at = rows.map(r => (r._1, r._2) -> r._3).toMap
    assert(at(((16, 1), 0.5)) > 0.99, "single-row bands catch almost all")
    assert(at(((1, 16), 0.5)) < 0.001, "one 16-row band catches near none")
    assert(rows.count(_._4 == 1) == 19, "exactly the in-code config flagged")
    assert(rows.filter(_._4 == 1).forall(_._1 == ((4, 4))))
  }

  test("rrfFuse: integer reciprocal-rank fusion, missing list scores 0") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "bm25_rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "knn_rank")
    val got = TextOps.rrfFuse(a, b, "id", "bm25_rank", "knn_rank", k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // id2: 10⁶/62 + 10⁶/61 = 16129+16393; id1: 10⁶/61; id4: 10⁶/62;
    // id3: 10⁶/63 — doc in both lists wins, then by the single rank
    assert(got.toSeq == Seq((1, 2L, 32522L), (2, 1L, 16393L),
      (3, 4L, 16129L), (4, 3L, 15873L)), s"got ${got.toSeq}")
  }

  test("lshRecallReport: exact dups are always recalled") {
    val r = Dedup.lshRecallReport(docs, "doc_id", "text", k = 3)
      .head()
    // docs fixture: (1,2) exact dup is the only jaccard ≥ 0.5 pair
    assert(r.getLong(0) == 1 && r.getLong(2) == 1 && r.getDouble(3) == 1.0,
      s"unexpected report: $r")
  }

  test("containmentPairs: short-doc-in-long-doc scores ~1 one way") {
    val d = Seq(
      // doc 2 is doc 1 plus a long unique tail: every shingle of 1 is
      // in 2 (contain_a = 1.0) but Jaccard is diluted to 3/18 — the
      // pair a symmetric threshold misses. The skewed pair is scored
      // via knownPairs because LSH banding under-recalls extreme size
      // skew (the operator's documented caveat; that's what the
      // shingle-sample block is for at scale).
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "entirely different words everywhere here today"),
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text", k = 3,
      minContain = 0.3,
      knownPairs = Some(Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (nInter, ca, cb) = got((1L, 2L))
    assert(nInter == 3L, s"3 shared 3-shingles, got $nInter")
    assert(ca == 1.0, "every shingle of the short doc is contained")
    assert(cb == 0.166667, s"18 shingles on the long side, got $cb")
    assert(!got.contains((1L, 3L)), "zero-overlap pair fails minContain")
  }

  test("bpeTrain: hand-computed merge sequence with deterministic ties") {
    val d = Seq((1L, "low lower low"), (2L, "new newer")).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(d, "text", numMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // r1: (l,o)=3 ties (o,w)=3 → lex smallest lhs wins
    // r2: (lo,w)=3   r3: (e,r)=(e,w)=(n,e)=2 → lex smallest (e,r)
    assert(got.toSeq == Seq((1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 2L)), got.mkString(", "))
  }

  test("bpeSegmentation: the trained encoder table after 3 merges") {
    val d = Seq((1L, "low lower low"), (2L, "new newer")).toDF("doc_id", "text")
    val got = TextOps.bpeSegmentation(d, "text", numMerges = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // merges: (l,o), (lo,w), (e,r)
    assert(got("low") == ((2L, "low")))
    assert(got("lower") == ((1L, "low␟er")))
    assert(got("newer") == ((1L, "n␟e␟w␟er")))
    assert(got("new") == ((1L, "n␟e␟w")))
  }

  test("bpeEncodeCounts: per-doc budgets through the trained table") {
    val d = Seq((1L, "low lower low"), (2L, "new newer")).toDF("doc_id", "text")
    val got = TextOps.bpeEncodeCounts(d, "doc_id", "text", numMerges = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // segs: low→[low], lower→[low,er], new→[n,e,w], newer→[n,e,w,er]
    assert(got(1L) == ((3L, 4L)))
    assert(got(2L) == ((2L, 7L)))
  }

  test("bpeTrain: greedy left-to-right non-overlap, early exhaustion") {
    val d = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(d, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // "aaa" → [aa, a] (2 overlapping candidates, ONE merge), then
    // [aaa], then no pairs left → stops at 2 merges, not 5
    assert(got.toSeq == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)),
      got.mkString(", "))
  }

  test("ngramCoverage: exact counts, 0-known floor, short-doc null") {
    val d = Seq(
      (1L, "a b c d"),        // shingles (a b c),(b c d) — both in docs 1,2,3
      (2L, "a b c d"),
      (3L, "a b c d"),
      (4L, "a b c unique tail"), // (a b c) common; 2 shingles unknown
      (5L, "xx yy"),          // < k tokens → 0 shingles, null coverage
    ).toDF("doc_id", "text")
    val got = TextOps.ngramCoverage(d, "doc_id", "text", k = 3, minDf = 2)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    // minDf=2 → known needs df ≥ 3: (a b c) df 4 ✓, (b c d) df 3 ✓
    assert(got(1L) == ((2L, 2L, Some(1.0))))
    assert(got(4L) == ((3L, 1L, Some(0.333333))))
    assert(got(5L) == ((0L, 0L, None)), "short doc → null coverage")
  }

  test("dedupCorpusKeepBest keeps the highest-score row per cluster") {
    // docs 1 and 2 are exact dups: the HIGHER-score copy (2) must be
    // the keeper, where dedupCorpusTransitive would keep min-id 1
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", 10L),
      (2L, "the quick brown fox jumps over the lazy dog", 99L),
      (3L, "completely different content about spark engines and shuffles", 5L),
    ).toDF("doc_id", "text", "len")
    val kept = Dedup.dedupCorpusKeepBest(d, "doc_id", "text", "len",
      k = 3, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  test("substringDedup cuts repeated spans everywhere but first occurrence") {
    val d = Seq(
      // keeper: doc 1 holds the first occurrence of the repeated span
      (1L, "one two three four intro words"),
      // doc 2 repeats the span mid-text → span cut, rest survives
      (2L, "prefix stuff one two three four suffix stuff"),
      // doc 3 is ONLY the repeated span → ""
      (3L, "one two three four"),
      // doc 4 shares nothing 4 tokens long
      (4L, "totally unrelated content lives here"),
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(d, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "one two three four intro words",
      "first occurrence is the keeper, untouched")
    assert(got(2L) == "prefix stuff suffix stuff")
    assert(got(3L) == "", "doc that is one big repeat comes back empty")
    assert(got(4L) == "totally unrelated content lives here")
  }

  test("substringDedup merges overlapping duplicated spans") {
    // docs 1/2 share a 5-token run; with k=4 the two overlapping
    // 4-shingles of the run are both duplicated — covered positions
    // must union into ONE maximal cut, not leave a mid-run remnant
    val d = Seq(
      (1L, "a b c d e tail one"),
      (2L, "head a b c d e tail two"),
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(d, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a b c d e tail one")
    // duplicated shingles in doc 2: (a b c d)@1, (b c d e)@2,
    // (c d e tail)@3 → covered 1..6 unions into one cut
    assert(got(2L) == "head two",
      "the whole shared region is cut as one merged span")
  }

  test("substringDedup digest-keyed mode equals raw-shingle mode") {
    val real = graft.model.Tables.documents(spark, sf)
    val raw = Dedup.substringDedup(real, "doc_id", "text", k = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashed = Dedup.substringDedup(real, "doc_id", "text", k = 6,
      hashShingles = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashed == raw, "64-bit digest keying must not change results")
  }

  test("substringDedup dedups WITHIN a doc too (first span kept)") {
    val d = Seq((1L, "x y z w middle x y z w")).toDF("doc_id", "text")
    val got = Dedup.substringDedup(d, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "x y z w middle",
      "second intra-doc occurrence cut, keeper span intact")
  }

  test("spanDedup cuts later occurrences of aligned repeated blocks") {
    // span=3: blocks are non-overlapping 3-token cuts of each doc
    val d = Seq(
      // doc 1 blocks: [a b c] [d e f] — both first occurrences
      (1L, "a b c d e f"),
      // doc 2 blocks: [a b c] [x y z] — first block is a repeat → cut
      (2L, "a b c x y z"),
      // doc 3 blocks: [g h i] [g h i] — intra-doc repeat, first kept
      (3L, "g h i g h i"),
      // doc 4: ragged 4-token doc → blocks [p q r] [s]; the 1-token
      // tail is below minTokens and must never count as a duplicate
      (4L, "p q r s"),
      (5L, "t u v s"),
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(d, "doc_id", "text", span = 3, minTokens = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("a b c d e f", 2L, 0L)), s"keeper doc: ${got(1L)}")
    assert(got(2L) == (("x y z", 2L, 1L)), "repeated first block cut")
    assert(got(3L) == (("g h i", 2L, 1L)), "intra-doc repeat keeps first")
    assert(got(4L) == (("p q r s", 2L, 0L)), "short tail block kept")
    assert(got(5L) == (("t u v s", 2L, 0L)),
      "sub-minTokens blocks never match each other")
  }

  test("spanDedup misaligned repeats are NOT cut (substringDedup's job)") {
    // the repeated run sits at offset 1 in doc 2, so its 3-blocks
    // differ from doc 1's — span dedup is alignment-sensitive by design
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "z a b c d e"),
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(d, "doc_id", "text", span = 3, minTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a b c d e f")
    assert(got(2L) == "z a b c d e")
  }

  test("cdcDedup re-syncs after an insertion and still cuts the repeat") {
    // doc 2 is doc 1 with one token PREPENDED: every fixed block
    // shifts (spanDedup finds nothing), but CDC boundaries are
    // content-decided, so chunks after the edit re-synchronize
    val real = graft.model.Tables.documents(spark, sf)
      .filter($"doc_id" === 1L).head.getAs[String]("text")
    val d = Seq((1L, real), (2L, "zzz " + real)).toDF("doc_id", "text")
    val span = Dedup.spanDedup(d, "doc_id", "text", span = 3, minTokens = 2)
      .filter($"doc_id" === 2L).head
    val cdc = Dedup.cdcDedup(d, "doc_id", "text", w = 3, divisor = 4,
      minTokens = 2)
      .filter($"doc_id" === 2L).head
    assert(span.getAs[Long]("n_cut") == 0L,
      s"fixed blocks must all miss under a 1-token shift: $span")
    assert(cdc.getAs[Long]("n_cut") > 0L,
      s"content-defined chunks must re-sync and cut: $cdc")
  }

  test("cdcDedup is a pure segmentation when nothing repeats") {
    // docs whose chunks are all unique come back VERBATIM — chunk
    // boundaries never lose or reorder tokens
    val real = graft.model.Tables.documents(spark, sf).limit(50)
    val got = Dedup.cdcDedup(real, "doc_id", "text", w = 3, divisor = 4,
      minTokens = 2)
    val joined = real.select($"doc_id", $"text").join(got, "doc_id")
    val unchanged = joined.filter($"n_cut" === 0L)
    assert(unchanged.count() > 0, "fixture has dup-free docs")
    assert(unchanged.filter($"text" =!= $"text_clean").count() == 0,
      "zero-cut docs must reconstruct verbatim")
  }

  test("cdcDedup hashChunks mode equals raw-chunk mode on real docs") {
    val real = graft.model.Tables.documents(spark, sf)
    val raw = Dedup.cdcDedup(real, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashed = Dedup.cdcDedup(real, "doc_id", "text", hashChunks = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashed == raw, "64-bit chunk keying must not change results")
  }

  test("spanDedup hashSpans mode equals raw-block mode on real docs") {
    val real = graft.model.Tables.documents(spark, sf)
    val raw = Dedup.spanDedup(real, "doc_id", "text", span = 3, minTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashed = Dedup.spanDedup(real, "doc_id", "text", span = 3,
      minTokens = 2, hashSpans = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashed == raw, "64-bit block keying must not change results")
  }

  test("spanDedup rebuilt text is a subsequence of block-aligned original") {
    // global invariant on real docs: n_spans = ceil(tokens/span), cuts
    // are counted, and rebuilt token count = tokens - span-sum of cuts
    val real = graft.model.Tables.documents(spark, sf)
    val span = 3
    val got = Dedup.spanDedup(real, "doc_id", "text", span = span,
      minTokens = 2)
    val joined = real.select(col("doc_id"),
        size(graft.functions.Portable.tokens(col("text"))).as("n_tok"))
      .join(got, "doc_id")
      .select(col("doc_id"), col("n_tok"), col("n_spans"), col("n_cut"),
        size(graft.functions.Portable.tokens(col("text_clean"))).as("n_kept"))
      .collect()
    joined.foreach { r =>
      val (nTok, nSpans, nCut, nKept) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(nSpans == (nTok + span - 1) / span, s"doc ${r.getLong(0)}")
      // every cut block was full-length (minTokens=2 < span only for
      // the single ragged tail, which can also be cut if >= 2 tokens)
      assert(nKept >= nTok - nCut * span && nKept <= nTok,
        s"doc ${r.getLong(0)}: kept $nKept of $nTok with $nCut cuts")
    }
  }

  test("cappedShingleFreqs: tf counted per shingle and capped") {
    import spark.implicits._
    val one = Seq((5L, Seq.fill(12)("a").mkString(" "))).toDF("doc_id", "text")
    // 12 tokens of "a" -> 10 occurrences of the single shingle
    // "a a a" (one digest row), capped at 8
    val ctf = Dedup.cappedShingleFreqs(one, "doc_id", "text")
      .collect().map(r => r.getLong(2))
    assert(ctf.toSeq == Seq(8L))
  }

  test("weightedJaccardPairs: fraction matches brute-force multiset Jaccard") {
    import spark.implicits._
    val sent = "w1 w2 w3 w4 w5 w6 w7"
    val docsW = Seq(
      (1L, s"$sent $sent $sent"), // sentence x3
      (2L, s"$sent $sent $sent"), // identical -> jw = 1 exactly
      (3L, s"$sent x1 x2 x3"),    // one copy + tail: shares the SET,
                                  // not the repetition mass
      (4L, "p1 p2 p3 p4 p5 p6 p7 p8")).toDF("doc_id", "text")
    val ctf = Dedup.cappedShingleFreqs(docsW, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    def brute(a: Long, b: Long): (Long, Long) = {
      val keys = ctf.keys.collect { case (d, s) if d == a || d == b => s }.toSet
      val pairs = keys.toSeq.map(s =>
        (ctf.getOrElse((a, s), 0L), ctf.getOrElse((b, s), 0L)))
      (pairs.map(p => math.min(p._1, p._2)).sum,
        pairs.map(p => math.max(p._1, p._2)).sum)
    }
    val got = Dedup.weightedJaccardPairs(docsW, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.contains((1L, 2L)), "identical docs must band together")
    got.foreach { case ((a, b), nd) => assert(nd == brute(a, b), s"($a,$b)") }
    val (n12, d12) = got((1L, 2L))
    assert(n12 == d12 && n12 > 0, "identical multisets -> jw exactly 1")
    // if the shared-sentence pair banded, its weighted score must sit
    // strictly below 1/2: the repeated mass is unshared
    got.get((1L, 3L)).foreach { case (n, d) => assert(n * 2 < d) }
    assert(!got.contains((1L, 4L)), "disjoint docs must not pair")
  }
}
