package graft.operators

import graft.SparkSpec

/** Curation operators: determinism of hash splits, packing arithmetic,
  * decontamination semantics.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "epsilon zeta eta theta"),
    (3L, "alpha beta gamma delta prime"),
    (4L, "totally unrelated words here"),
    (20L, "alpha beta gamma benchmark")).toDF("doc_id", "text")

  test("curationAudit: per-doc fates agree with the pipeline's decisions") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val audit = Curation.curationAudit(corpus, "doc_id", "text", "source")
      .localCheckpoint() // three reads below
    // total accounting: every input doc gets exactly one verdict
    assert(audit.count() == corpus.count())
    // the kept set must be IDENTICAL to what curateCorpus ships,
    // including split/pack assignments
    val keptAudit = audit.filter($"fate" === "kept")
      .select("doc_id", "split", "pack_id")
      .collect().map(_.toSeq).toSet
    val pipeline = Curation.curateCorpus(corpus, "doc_id", "text", "source")
      .select("doc_id", "split", "pack_id")
      .collect().map(_.toSeq).toSet
    assert(keptAudit == pipeline, "audit 'kept' must equal the pipeline output")
    // near-dup blame points at the cluster keeper: a kept doc, never
    // itself, always a smaller id (min-id policy)
    val blamed = audit.filter($"fate" === "near_dup")
      .select("doc_id", "blame_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val keptIds = keptAudit.map(_.head.asInstanceOf[Long])
    blamed.foreach { case (id, blame) =>
      assert(blame < id, s"min-id keeper must have the smaller id ($id → $blame)")
      assert(keptIds.contains(blame), s"blamed keeper $blame must itself be kept")
    }
    // quality-dropped docs carry no blame/split/pack
    assert(audit.filter($"fate" === "quality" &&
      ($"blame_id".isNotNull || $"split".isNotNull || $"pack_id".isNotNull))
      .count() == 0)
  }

  test("curationAuditModel: model gate first, fates still partition the corpus") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val audit = Curation
      .curationAuditModel(corpus, "doc_id", "text", "source")
      .localCheckpoint()
    assert(audit.count() == corpus.count(),
      "every input doc gets exactly one verdict")
    // model_filtered ≡ the complement of the gate's kept-id set
    val gateIds = Curation.modelQualityIds(corpus, "doc_id", "text")
      .as[Long].collect().toSet
    val refused = audit.filter($"fate" === "model_filtered")
      .select("doc_id").as[Long].collect().toSet
    val allIds = corpus.select("doc_id").as[Long].collect().toSet
    assert(refused == allIds -- gateIds)
    assert(refused.nonEmpty && gateIds.nonEmpty,
      "fixture must exercise both sides of the model gate")
    // refused docs carry no downstream verdicts
    assert(audit.filter($"fate" === "model_filtered" &&
      ($"blame_id".isNotNull || $"split".isNotNull || $"pack_id".isNotNull))
      .count() == 0)
    // kept set ≡ the v2 pipeline's shipped output, split/pack included
    val keptAudit = audit.filter($"fate" === "kept")
      .select("doc_id", "split", "pack_id")
      .collect().map(_.toSeq).toSet
    val pipeline = Curation
      .curateCorpusModel(corpus, "doc_id", "text", "source")
      .select("doc_id", "split", "pack_id")
      .collect().map(_.toSeq).toSet
    assert(keptAudit == pipeline)
    // stage order: every downstream fate (quality/near_dup/kept) is a
    // gate survivor
    val downstream = audit.filter($"fate" =!= "model_filtered")
      .select("doc_id").as[Long].collect().toSet
    assert(downstream == gateIds)
  }

  test("hash sampling is deterministic and partition-independent") {
    val a = Curation.hashSample(docs, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.hashSample(docs.repartition(7), "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same sample regardless of partitioning")
    // monotone: a larger pct only adds rows
    val bigger = Curation.hashSample(docs, "doc_id", 90)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(bigger))
    assert(Curation.hashSample(docs, "doc_id", 100).count() == docs.count())
    assert(Curation.hashSample(docs, "doc_id", 0).count() == 0)
  }

  test("split buckets partition the corpus and respect percentages") {
    val n = 500
    val many = (1L to n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val split = Curation.datasetSplit(many, "doc_id", 80, 10)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n)
    // md5 buckets are uniform-ish; generous tolerance, deterministic seed
    assert(counts("train") > n * 70 / 100 && counts("train") < n * 90 / 100,
      counts.toString)
    assert(counts.keySet == Set("train", "val", "test"))
    // every doc keeps its split across runs/partitionings
    val again = Curation.datasetSplit(many.repartition(13), "doc_id", 80, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
  }

  test("leakageSafeSplit: near-dup cluster members never straddle splits") {
    // two 2-doc clusters + two singletons; cluster map as
    // connectedComponents would label it (min id per component)
    val docs2 = Seq(1L, 2L, 3L, 4L, 5L, 6L)
      .map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (4L, 1L), (2L, 2L), (5L, 2L))
      .toDF("doc_id", "component")
    val split = Curation.leakageSafeSplit(docs2, "doc_id", clusters)
      .select("doc_id", "component", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = split.map(t => t._1 -> t._3).toMap
    // THE invariant: same component ⇒ same split
    assert(byDoc(1L) == byDoc(4L), "cluster {1,4} must share a split")
    assert(byDoc(2L) == byDoc(5L), "cluster {2,5} must share a split")
    // singletons fall back to their own id = the datasetSplit bucket
    val solo = Curation.datasetSplit(docs2.filter($"doc_id" >= 3L)
        .filter($"doc_id" =!= 4L && $"doc_id" =!= 5L), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc(3L) == solo(3L) && byDoc(6L) == solo(6L),
      "singleton docs keep the per-doc hash split")
    // clustered docs bucket on the COMPONENT label, not their own id
    assert(split.filter(_._2 == 1L).map(_._3).distinct.length == 1)
  }

  test("qualityBudgetCap ≡ greedy best-first replay per source") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
      .withColumn("n_tokens", org.apache.spark.sql.functions
        .size(graft.functions.Portable.tokens($"text")).cast("long"))
    val budget = 300L
    val got = Curation.qualityBudgetCap(corpus, "doc_id", "text",
        "source", "n_tokens", budget, buckets = 256)
      .select("doc_id").as[Long].collect().toSet
    // replay: margins collected, per source sort (margin desc, id),
    // admit the prefix strictly before the first budget crossing
    val m = Classify.perceptronQuality(corpus, "doc_id", "text", 256, 1)
      .select("doc_id", "margin")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meta = corpus.select("doc_id", "source", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(t => m.contains(t._1))
    val expected = meta.groupBy(_._2).values.flatMap { rows =>
      var cum = 0L
      rows.sortBy(t => (-m(t._1), t._1)).takeWhile { t =>
        cum += t._3; cum <= budget
      }.map(_._1)
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < meta.length,
      "budget must actually cut on the fixture")
  }

  test("packUtilization: token mass conserved, overflow packs flagged past 10000 bp") {
    val df = Seq((1L, "a", 4L), (2L, "a", 4L), (3L, "a", 4L),
      (4L, "b", 12L)).toDF("id", "g", "nt")
    val util = Curation.packUtilization(
      Curation.packSequences(df, "id", "nt", 10L, "g"), "nt", 10L, "g")
      .collect()
    assert(util.map(_.getAs[Long]("pack_tokens")).sum == 24L)
    // exclusive-prefix packing puts all three 4-token docs in pack 0
    // (cum-before 0/4/8 < 10): the overflow pack reads 12000 bp
    val a0 = util.find(r => r.getAs[String]("g") == "a").get
    assert(a0.getAs[Long]("pack_id") == 0L &&
      a0.getAs[Long]("n_docs") == 3L &&
      a0.getAs[Long]("util_bp") == 12000L)
    val b0 = util.find(r => r.getAs[String]("g") == "b").get
    assert(b0.getAs[Long]("util_bp") == 12000L)
  }

  test("packSequences: exclusive-prefix quota arithmetic per group") {
    val df = Seq(
      (1L, "g", 100L), (2L, "g", 100L), (3L, "g", 100L), // cum 0,100,200
      (4L, "g", 100L),                                   // cum 300 → pack 1
      (5L, "h", 900L),                                   // own group
      (6L, "h", 50L)                                     // pack 3 (900/256)
    ).toDF("id", "grp", "toks")
    val out = Curation.packSequences(df, "id", "toks", 256L, "grp")
      .select("id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L,
      5L -> 0L, 6L -> 3L), out.toString)
  }

  test("decontamination drops exactly the shingle-sharing train docs") {
    val bench = docs.filter($"doc_id" === 20L)
    val train = docs.filter($"doc_id" =!= 20L)
    // docs 1 and 3 share the "alpha beta gamma" 3-shingle with bench;
    // 2 and 4 share nothing
    val contaminated = Curation.contaminatedIds(train, bench,
      "doc_id", "text").as[Long].collect().toSet
    assert(contaminated == Set(1L, 3L))
    val clean = Curation.decontaminate(train, bench, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 4L))
  }

  test("bloom filter: zero false negatives, bounded false positives") {
    import org.apache.spark.sql.functions.{concat, lit}
    import graft.functions.Bloom
    val (mBits, k) = (1 << 14, 4)
    val keys = spark.range(1000)
      .select(concat(lit("key_"), $"id").as("k"))
    val bits = Bloom.build(keys, "k", mBits, k)
    val inserted = keys
      .filter(!Bloom.mightContain($"k", bits, mBits, k)).count()
    assert(inserted == 0, "an inserted key must ALWAYS pass")
    // 1000 keys in 16384 bits, 4 hashes → textbook fp ≈ 2.4%; assert a
    // loose 10% so the bound is about correctness, not luck
    val fp = spark.range(1000)
      .select(concat(lit("other_"), $"id").as("k"))
      .filter(Bloom.mightContain($"k", bits, mBits, k)).count()
    assert(fp < 100, s"false-positive rate out of range: $fp/1000")
    // the codegen'd array probe must agree with the HOF scalar probe
    // bit-for-bit (build-path hash replication)
    import org.apache.spark.sql.functions.array
    import graft.expressions.BloomExpressions.bloomAnyContain
    val nativeMiss = keys.select(array($"k").as("a"))
      .filter(!bloomAnyContain($"a", bits, mBits, k)).count()
    assert(nativeMiss == 0, "native probe produced a false negative")
    val nativeFp = spark.range(1000)
      .select(array(concat(lit("other_"), $"id")).as("a"))
      .filter(bloomAnyContain($"a", bits, mBits, k)).count()
    assert(nativeFp == fp, s"native fp $nativeFp != HOF fp $fp")
  }

  test("fused shingle probe agrees with the HOF form everywhere") {
    import org.apache.spark.sql.functions.{col, exists}
    import graft.functions.{Bloom, Portable}
    import graft.expressions.BloomExpressions.bloomShingleContain
    val (mBits, nh, k) = (1 << 12, 4, 3)
    // real corpus docs + crafted whitespace edges (tabs, multi-space,
    // trailing blanks, short docs) — the fused tokenizer must replicate
    // Portable.tokens/shingles EXACTLY or candidates diverge
    val real = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val crafted = Seq(
      (9001L, "alpha\tbeta  gamma delta "),
      (9002L, "  leading and trailing   "),
      (9003L, "short one"),
      (9004L, ""),
      (9005L, "alpha beta gamma")).toDF("doc_id", "text")
    val docs = real.unionByName(crafted).localCheckpoint()
    val benchSh = graft.operators.Dedup.docShingles(
      docs.filter($"doc_id" % 7 === 0), "doc_id", "text", k, dedup = false)
      .select("shingle").distinct()
    val bits = Bloom.build(benchSh, "shingle", mBits, nh)
    // HOF form: materialized token projection (explode barrier), the
    // shape docShingles uses to dodge the inline-split trap
    val hof = docs
      .withColumn("__toks", Portable.tokens(col("text")))
      .filter(exists(Portable.shingles(col("__toks"), k),
        s => Bloom.mightContain(s, bits, mBits, nh)))
      .select("doc_id").as[Long].collect().toSet
    val fused = docs
      .filter(bloomShingleContain(col("text"), k, bits, mBits, nh))
      .select("doc_id").as[Long].collect().toSet
    assert(fused == hof,
      s"diverged: fused-only=${fused -- hof}, hof-only=${hof -- fused}")
    assert(fused.nonEmpty, "sanity: the bench subset must self-hit")
  }

  test("decontaminateBloom equals exact decontaminate") {
    val bench = docs.filter($"doc_id" === 20L)
    val train = docs.filter($"doc_id" =!= 20L)
    val viaBloom = Curation.decontaminateBloom(train, bench,
      "doc_id", "text", mBits = 1 << 12, numHashes = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(viaBloom == Set(2L, 4L), "bloom pruning must not change results")
  }

  test("interleaveBySource round-robins groups deterministically") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "c")).toDF("id", "grp")
    val out = Curation.interleaveBySource(d, "id", "grp")
      .orderBy("rid").collect()
      .map(r => (r.getLong(2), r.getString(1)))
    // first |groups| rows must be one doc from EACH group, the next
    // wave one from each group that still has docs, etc.
    assert(out.take(3).map(_._2).toSet == Set("a", "b", "c"),
      s"wave 1 must cover every group: ${out.toSeq}")
    assert(out.slice(3, 5).map(_._2).toSet == Set("a", "b"),
      s"wave 2 covers surviving groups: ${out.toSeq}")
    assert(out(5)._2 == "a")
    val again = Curation.interleaveBySource(d, "id", "grp")
      .orderBy("rid").collect().map(r => (r.getLong(2), r.getString(1)))
    assert(out.sameElements(again), "interleave must be deterministic")
  }

  test("budgetedSample: under-budget groups whole, heavy groups thinned") {
    import org.apache.spark.sql.functions.col
    // group "small" totals 30 tokens (≤ budget → rate 1, all pass);
    // "big" totals 4000 across 40 docs (rate 0.01 → ~0-2 survivors)
    val small = (1L to 3L).map(i => (i, "small", 10L))
    val big = (100L to 139L).map(i => (i, "big", 100L))
    val df = (small ++ big).toDF("id", "grp", "toks")
    val kept = Curation.budgetedSample(df, "id", "grp", "toks", 40L)
      .select("id", "grp").collect()
    val smallKept = kept.count(_.getString(1) == "small")
    val bigKept = kept.count(_.getString(1) == "big")
    assert(smallKept == 3, "under-budget group must pass whole")
    assert(bigKept < 40, s"over-budget group must thin, kept $bigKept")
    // deterministic: the same call returns the same selection
    val again = Curation.budgetedSample(df, "id", "grp", "toks", 40L)
      .select("id").as[Long].collect().toSet
    assert(again == kept.map(_.getLong(0)).toSet)
  }

  test("mixtureSample: whole-rate copies exact, rate 0 drops, default 1×") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "grp")
    val out = Curation.mixtureSample(df, "doc_id", "grp",
      Map("a" -> 3.0, "b" -> 0.0))
      .select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // group a: exactly 3 copies each (no fractional part); b dropped;
    // c defaults to exactly 1
    assert(out.count(_._1 == 1L) == 3)
    assert(out.count(_._1 == 2L) == 3)
    assert(!out.exists(_._1 == 3L), "rate-0 group must vanish")
    assert(out.filter(_._1 == 4L).toSeq == Seq((4L, 1)))
    // copy_idx enumerates 1..n
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1, 2, 3))
    // fractional rates keep E[copies] = r via hash buckets: over many
    // keys, a 0.5 rate keeps about half — and is deterministic
    val many = (1L to 200L).map(i => (i, "x")).toDF("doc_id", "grp")
    val frac = Curation.mixtureSample(many, "doc_id", "grp",
      Map("x" -> 0.5)).count()
    assert(frac > 60 && frac < 140, s"0.5 rate kept $frac of 200")
    val again = Curation.mixtureSample(many, "doc_id", "grp",
      Map("x" -> 0.5)).select("doc_id").as[Long].collect().toSet
    val first = Curation.mixtureSample(many, "doc_id", "grp",
      Map("x" -> 0.5)).select("doc_id").as[Long].collect().toSet
    assert(again == first, "hash sampling must be deterministic")
  }

  test("mixtureSample honors fractional rates to basis points") {
    import org.apache.spark.sql.functions.col
    val many = (1L to 500L).map(i => (i, "x")).toDF("doc_id", "grp")
    // rate 0.125 must select exactly the keys whose 10000-bucket hash
    // falls under 1250 bp — a percent bucket space would quantize this
    // to 0.13 (bucket < 13 of 100), a different key set (r2 advice)
    val kept = Curation.mixtureSample(many, "doc_id", "grp",
      Map("x" -> 0.125)).select("doc_id").as[Long].collect().toSet
    val expected = many
      .filter(Curation.hashBucket(col("doc_id"), 10000) < 1250)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == expected)
    val pctQuantized = many
      .filter(Curation.hashBucket(col("doc_id"), 100) < 13)
      .select("doc_id").as[Long].collect().toSet
    assert(kept != pctQuantized,
      "basis-point arithmetic must differ from whole-percent quantization")
  }

  test("curateCorpus: gate drops degenerate/short docs, dedup keeps min id") {
    val long1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, long1, "s0"),                       // survives
      (2L, long1, "s0"),                       // exact dup of 1 → dropped
      (3L, "spam spam spam spam spam spam spam spam spam spam " +
        "spam spam spam spam spam spam spam spam spam spam", "s0"), // degenerate
      (4L, "too short", "s1"),                 // < 20 tokens
      (5L, (100 to 131).map(i => s"v$i").mkString(" "), "s1"), // survives
    ).toDF("doc_id", "text", "source")
    val out = Curation.curateCorpus(corpus, "doc_id", "text", "source")
      .select("doc_id", "split", "pack_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ids = out.map(_._1).toSet
    assert(ids == Set(1L, 5L), s"got $ids")
    assert(out.forall(r => Set("train", "val", "test").contains(r._2)))
    assert(out.forall(_._3 == 0L), "single doc per stratum → pack 0")
  }

  test("chunkTokens: overlapping windows, dense 0-based chunk ids") {
    val df = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkTokens(df, "doc_id", "text",
      chunkSize = 4, overlap = 1)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(chunks.toSeq == Seq(
      (0L, "t1 t2 t3 t4"), (1L, "t4 t5 t6 t7"),
      (2L, "t7 t8 t9 t10"), (3L, "t10")))
    // a doc shorter than one chunk still yields exactly one chunk
    val one = Curation.chunkTokens(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 16)
      .collect()
    assert(one.length == 1 && one.head.getString(2) == "a b")
  }

  test("boilerplateNgrams finds shingles shared across enough docs") {
    val corpus = Seq(
      (1L, "all rights reserved foo"),
      (2L, "all rights reserved bar"),
      (3L, "all rights reserved baz"),
      (4L, "something else entirely here")).toDF("doc_id", "text")
    val bp = TextOps.boilerplateNgrams(corpus, "doc_id", "text",
      k = 3, minDocs = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bp == Map("all rights reserved" -> 3L))
  }

  test("contaminationReport: shares, blame doc, min-id tie, clean docs absent") {
    import spark.implicits._
    val bench = Seq(
      (100L, "a b c d e"),   // shingles: "a b c" "b c d" "c d e"
      (101L, "a b c z z")).toDF("doc_id", "text")
    val train = Seq(
      // 2 of 3 shingles hit bench 100 → share 2/3, blame 100
      (1L, "a b c d x"),
      // clean — must not appear in the report
      (2L, "p q r s t"),
      // only "a b c", shared by BOTH bench docs 1-1 → tie blames 100
      (3L, "a b c q q q")).toDF("doc_id", "text")
    val got = Curation.contaminationReport(train, bench, "doc_id", "text",
      k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got.keySet == Set(1L, 3L), s"clean docs must be absent: $got")
    assert(got(1L) == ((3L, 2L, 0.666667, 100L, 2L)), s"got ${got(1L)}")
    assert(got(3L) == ((4L, 1L, 0.25, 100L, 1L)),
      s"blame tie must break to min bench id: ${got(3L)}")
  }

  test("curriculumOrder: dense 1..n permutation, margins non-increasing") {
    val d = spark.read.parquet(
      s"/root/testdata/sf0.001/documents.parquet")
    val rows = Curation.curriculumOrder(d, "doc_id", "text")
      .orderBy("rid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq,
      "rid must be a dense permutation")
    assert(rows.map(_._2).distinct.length == rows.length,
      "every labeled doc exactly once")
    rows.sliding(2).foreach {
      case Array((_, _, m1), (_, id2, m2)) =>
        assert(m2 <= m1, s"margins must not increase along rid: $id2")
      case _ =>
    }
  }
}
