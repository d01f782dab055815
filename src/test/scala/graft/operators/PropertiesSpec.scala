package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.pipeline.Steps

/** Property-based invariants (SURVEY.md §5.4): pivot ≡ N-left-join on
  * duplicate-free long tables, sparse-filter threshold monotonicity,
  * union+distinct idempotence, minhash bounds, coercion threshold.
  * Plain ScalaCheck Gen with fixed seeds (the scalatest bridge artifact
  * isn't in the offline cache); deterministic across runs.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val longTableGen: Gen[Seq[(String, String, Option[Double])]] =
    Gen.listOf(for {
      p <- Gen.oneOf("m1", "m2", "m3")
      s <- Gen.oneOf("S1", "S2", "S3", "S4")
      v <- Gen.option(Gen.choose(-100.0, 100.0))
    } yield (p, s, v)).map(_.distinctBy(t => (t._1, t._2)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default.withSize(12)
    (1 to n).flatMap(i => g.apply(params, Seed(42L + i)))
  }

  private def toDf(rows: Seq[(String, String, Option[Double])]): DataFrame =
    rows.toDF("p", "s", "value")
      .select($"p", $"s", $"value".cast("double").as("value"))

  private val corpusGen: Gen[Seq[(Long, String)]] = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("block dedups: every doc accounted, zero-cut docs reconstruct verbatim") {
    // property over random small-vocab corpora (high dup density) for
    // BOTH block-dedup forms: output covers every doc exactly once,
    // n_cut ≤ n_spans, and a doc with zero cuts comes back VERBATIM
    // (segmentation loses no tokens)
    samples(corpusGen, 6).foreach { docs =>
      val d = docs.toDF("doc_id", "text")
      for (form <- Seq(
        Dedup.spanDedup(d, "doc_id", "text", span = 3, minTokens = 2),
        Dedup.cdcDedup(d, "doc_id", "text", w = 2, divisor = 3,
          minTokens = 2))) {
        val got = form.collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
            r.getLong(3)))).toMap
        assert(got.keySet == docs.map(_._1).toSet, "one row per doc")
        docs.foreach { case (id, text) =>
          val (clean, nSpans, nCut) = got(id)
          assert(nCut <= nSpans, s"doc $id")
          if (nCut == 0 && text.trim.nonEmpty)
            assert(clean == text.trim.replaceAll("\\s+", " "),
              s"zero-cut doc $id must reconstruct: '$text' -> '$clean'")
        }
      }
    }
  }

  test("substringDedup ≡ brute-force covered-position reference on random corpora") {
    // reference implementation: enumerate every k-shingle occurrence,
    // keep the global min (id, start) of each duplicated shingle, mark
    // all other occurrences' k positions covered, rebuild — the
    // semantics the interval-based distributed form must reproduce
    val k = 3
    def reference(docs: Seq[(Long, String)]): Map[Long, String] = {
      val toks = docs.map { case (id, t) =>
        id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      }.toMap
      val occ = for {
        (id, ts) <- toks.toSeq
        start <- 0 to (ts.length - k) if ts.length >= k
      } yield (ts.slice(start, start + k).mkString(" "), id, start)
      val dup = occ.groupBy(_._1).filter(_._2.size >= 2)
      val cut = dup.values.flatMap { os =>
        val keeper = os.map(o => (o._2, o._3)).min
        os.filter(o => (o._2, o._3) != keeper)
      }
      val covered = cut.toSeq.flatMap(o =>
        (o._3 until o._3 + k).map(p => (o._2, p))).toSet
      toks.map { case (id, ts) =>
        id -> ts.zipWithIndex
          .filter { case (_, p) => !covered((id, p)) }
          .map(_._1).mkString(" ")
      }
    }
    samples(corpusGen, 8).filter(_.nonEmpty).foreach { docs =>
      val d = docs.toDF("doc_id", "text")
      val got = Dedup.substringDedup(d, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = reference(docs)
      assert(got == want,
        s"interval form diverged from reference on $docs:\n$got\nvs\n$want")
    }
  }

  test("pivot form ≡ sequential-left-join form on duplicate-free members") {
    samples(Gen.zip(longTableGen, longTableGen), 5).foreach { case (t1, t2) =>
      if (t1.nonEmpty || t2.nonEmpty) {
        val (a, b) = (toDf(t1), toDf(t2))
        val keys = Seq("p", "s")
        val sp = Relational.spine(Seq(a, b).map(_.select("p", "s")), keys)
        val viaJoin = Relational.wideViewJoin(sp, keys,
          Seq("ta" -> a.select($"p", $"s", $"value"),
            "tb" -> b.select($"p", $"s", $"value")))
        val viaPivot = sp.join(
          Relational.wideViewPivot(Seq("ta" -> a, "tb" -> b), keys, "value"),
          keys, "left")
        val l = viaJoin.select("p", "s", "ta", "tb").collect()
          .map(_.toSeq).toSet
        val r = viaPivot.select("p", "s", "ta", "tb").collect()
          .map(_.toSeq).toSet
        assert(l == r, s"join=$l pivot=$r")
      }
    }
  }

  test("raising the sparse threshold never increases surviving rows") {
    samples(longTableGen, 5).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("DTI_CL_MES", "DTI_CL_ESTACIONES_METEO", "Value")
      val counts = (1L to 4L).map(k =>
        Steps.filterSparseStations(df, minRecords = k)._1.count())
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"not monotone: $counts")
    }
  }

  test("spine (union+distinct) is idempotent and order-insensitive") {
    samples(Gen.zip(longTableGen, longTableGen), 5).foreach { case (t1, t2) =>
      if (t1.nonEmpty && t2.nonEmpty) {
        val (a, b) = (toDf(t1), toDf(t2))
        val ab = Relational.spine(Seq(a, b), Seq("p", "s")).collect()
          .map(_.toSeq).toSet
        val ba = Relational.spine(Seq(b, a, a), Seq("p", "s")).collect()
          .map(_.toSeq).toSet
        assert(ab == ba)
      }
    }
  }

  test("minhash estimate is 1.0 for identical docs and in [0,1] always") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "x y z w v u t")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(
      Dedup.docShingles(docs, "doc_id", "text", 3, dedup = false), "doc_id")
    val est = Dedup.estimatedJaccard(
      Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b"), sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 2L)) == 1.0)
    assert(est((1L, 3L)) >= 0.0 && est((1L, 3L)) <= 1.0)
  }

  test("coerceAllNumeric honors the 50% threshold per column") {
    val df = Seq(
      ("1.5", "x", "10"), ("2.5", "y", "z"), ("bad", "z", "30"),
      ("4.0", "w", "40")).toDF("mostly_num", "never_num", "three_quarters")
    val out = Steps.coerceAllNumeric(df)
    val types = out.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("mostly_num") == "double", "3/4 parse → cast")
    assert(types("never_num") == "string", "0/4 parse → keep")
    assert(types("three_quarters") == "double", "3/4 parse → cast")
    assert(out.select("mostly_num").collect().map(r =>
      Option(r.get(0))).toSeq == Seq(Some(1.5), Some(2.5), None, Some(4.0)),
      "unparseable values become null after cast")
  }

  test("asofJoin ≡ naive max-ts-below join on random keyed streams") {
    import java.sql.Timestamp
    val evGen: Gen[(Int, Int)] = for {
      k <- Gen.choose(0, 4)
      t <- Gen.choose(0, 2000)
    } yield (k, t)
    def mkTs(t: Int) = new Timestamp(1700000000000L + t * 1000L)
    for (round <- 1 to 3) {
      val params = Gen.Parameters.default.withSize(60)
      val ls = (1 to 60).flatMap(i =>
        evGen.apply(params, Seed(round * 1000L + i)))
      val rs0 = (1 to 60).flatMap(i =>
        evGen.apply(params, Seed(round * 2000L + i)))
      // unique (key, ts) on the right, as the operator requires
      val rs = rs0.distinctBy(identity).zipWithIndex
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, s"k$k", mkTs(t)) }
        .toDF("id", "key", "ts")
      val right = rs
        .map { case ((k, t), i) => (s"k$k", mkTs(t), i.toDouble) }
        .toDF("key", "ts", "v")

      val got = Temporal.asofJoin(left, right, Seq("key"), "ts", Seq("v"))
        .select("id", "asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      // naive: per left row, the max right ts <= left ts, then its value
      val naive = left.as("l")
        .join(right.as("r"),
          expr("l.key = r.key AND r.ts <= l.ts"), "left")
        .groupBy($"l.id")
        .agg(max(struct($"r.ts", $"r.v")).as("best"))
        .select($"id", $"best.v")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got == naive, s"round $round mismatch")
    }
  }

  test("chunking reconstructs the document: zero-overlap chunks concat to the original") {
    val textGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("ab", "cd", "ef", "gh")).map(_.mkString(" ")))
    samples(textGen, 8).zipWithIndex.foreach { case (text, i) =>
      val df = Seq((i.toLong, text)).toDF("doc_id", "text")
      for (size <- Seq(1, 5, 16)) {
        val rebuilt = Curation.chunkTokens(df, "doc_id", "text", size)
          .orderBy("chunk_idx").select("chunk_text").as[String]
          .collect().mkString(" ")
        assert(rebuilt == text, s"chunkSize=$size must partition exactly")
      }
    }
  }

  test("connectedComponents is a fixpoint: relabeling the labeled graph changes nothing") {
    val pairsGen = Gen.listOf(
      Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L))
        .suchThat(p => p._1 != p._2))
    samples(pairsGen, 6).filter(_.nonEmpty).foreach { ps =>
      val pairs = ps.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct.toDF("id_a", "id_b")
      val verts = (1L to 12L).toDF("id")
      val comps = Dedup.connectedComponents(pairs, verts, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every edge's endpoints agree, and each component's label is its min
      ps.foreach { case (a, b) =>
        assert(comps(a) == comps(b), s"edge ($a,$b) split across components")
      }
      comps.groupBy(_._2).foreach { case (label, members) =>
        assert(members.keys.min == label,
          s"component label $label must be its min member")
      }
    }
  }

  test("mergeIntervals: islands are disjoint, ordered, and cover every interval") {
    import java.sql.Timestamp
    def mkTs(t: Int) = new Timestamp(1700000000000L + t * 1000L)
    val ivGen = Gen.listOf(for {
      k <- Gen.oneOf("a", "b")
      s <- Gen.choose(0, 500)
      len <- Gen.choose(1, 120)
    } yield (k, s, s + len))
    samples(ivGen, 6).filter(_.nonEmpty).foreach { ivs =>
      val df = ivs.map { case (k, s, e) => (k, mkTs(s), mkTs(e)) }
        .toDF("k", "s", "e")
      val islands = Temporal.mergeIntervals(df, "k", "s", "e")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime))
      // per key: islands strictly ordered and non-touching
      islands.groupBy(_._1).foreach { case (k, is) =>
        val sorted = is.sortBy(_._2)
        sorted.zip(sorted.tail).foreach { case (a, b) =>
          assert(a._4 < b._3, s"key $k: islands $a and $b touch/overlap")
        }
      }
      // every source interval is inside exactly one island
      ivs.foreach { case (k, s, e) =>
        val (sMs, eMs) = (mkTs(s).getTime, mkTs(e).getTime)
        val hosts = islands.filter(i =>
          i._1 == k && i._3 <= sMs && eMs <= i._4)
        assert(hosts.length == 1, s"interval ($k,$s,$e) in ${hosts.length} islands")
      }
      // island count per key = n_intervals sum check
      assert(islands.map(_._2).nonEmpty)
    }
  }

  test("tokenBudgetCap: per-group admitted totals never exceed the budget") {
    val rowGen = Gen.listOf(for {
      g <- Gen.oneOf("s1", "s2", "s3")
      n <- Gen.choose(1L, 40L)
    } yield (g, n))
    samples(rowGen, 6).filter(_.nonEmpty).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, n), i) => (i.toLong, g, n) }
        .toDF("id", "grp", "n_tokens")
      for (budget <- Seq(10L, 50L, 200L)) {
        val kept = Curation.tokenBudgetCap(df, "id", "grp", "n_tokens", budget)
          .groupBy("grp").agg(sum("n_tokens").as("t"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(kept.values.forall(_ <= budget), s"budget=$budget kept=$kept")
      }
      // monotone: a bigger budget never keeps fewer rows
      val counts = Seq(10L, 50L, 200L).map(b =>
        Curation.tokenBudgetCap(df, "id", "grp", "n_tokens", b).count())
      assert(counts.zip(counts.tail).forall { case (a, b) => a <= b }, counts)
    }
  }

  test("weightedSample: exactly min(n, group size) rows, deterministic across runs") {
    val df = (1L to 120L).map(i => (i, s"g${i % 3}", 1L + i % 7))
      .toDF("id", "grp", "w")
    val out1 = Curation.weightedSample(df, "id", "w", "grp", 5)
      .select("id").as[Long].collect().sorted.toSeq
    val out2 = Curation.weightedSample(df, "id", "w", "grp", 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out1 == out2, "hash selection must be run-stable")
    val perGroup = Curation.weightedSample(df, "id", "w", "grp", 5)
      .groupBy("grp").count().select("count").as[Long].collect()
    assert(perGroup.forall(_ == 5L), perGroup.toSeq)
  }

  test("histogram: bucket counts sum to row count, bounds clamp outliers") {
    val vals = Seq(-100.0, -5.0, -0.01, 0.0, 2.5, 4.99, 5.0, 99.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i, "g", v) }
      .toDF("id", "grp", "v")
    val buckets = graft.operators.Features
      .histogram(df, "v", "grp", lo = -5.0, hi = 5.0, nBuckets = 10)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(buckets.values.sum == vals.length, "every row lands in a bucket")
    assert(buckets.keys.forall(b => b >= 0 && b <= 9), buckets)
    // the two under/overflow values clamp to the edge buckets
    assert(buckets(0) >= 2, "-100 and -5 clamp to bucket 0")
    assert(buckets(9) >= 2, "5.0 and 99 clamp to bucket 9")
  }

  test("pageRank: total mass bounded, every rank >= the base, determinism") {
    val edgeGen = Gen.listOf(
      Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L))
        .suchThat(p => p._1 != p._2))
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { es =>
      val edges = es.distinct.toDF("src", "dst")
      val nodes = (1L to 10L).toDF("id")
      val r = Graph.pageRank(nodes, edges, "id", "src", "dst", 3)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(r.size == 10)
      assert(r.values.forall(_ >= 150000L), s"below base: $r")
      // mass can only evaporate (dangling + truncation), never inflate
      assert(r.values.sum <= 10L * 1000000L + 10L * 150000L, r.values.sum)
    }
  }

  test("mixtureSample copy counts: floor(r) or ceil(r) per row, E[copies] bracket") {
    val df = (1L to 300L).map(i => (i, "g")).toDF("doc_id", "grp")
    for (rate <- Seq(0.25, 1.5, 2.75)) {
      val copies = Curation.mixtureSample(df, "doc_id", "grp", Map("g" -> rate))
        .groupBy("doc_id").count().select("count").as[Long].collect()
      val (lo, hi) = (math.floor(rate).toLong, math.ceil(rate).toLong)
      assert(copies.forall(c => c == lo || c == hi))
      val mean = (copies.sum.toDouble +
        0L * (300 - copies.length)) / 300 // absent rows = 0 copies
      assert(math.abs(mean - rate) < 0.15, s"rate=$rate mean=$mean")
    }
  }

  test("round-3 text operators tolerate null and empty text rows") {
    import org.apache.spark.sql.functions.col
    val d = Seq[(java.lang.Long, String)](
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, null),
      (4L, ""),
      (5L, "   "),
    ).toDF("doc_id", "text")

    // substring dedup: doc 2 is a full repeat → ""; null/empty docs
    // come back as "" (no tokens survive a null tokenization)
    val sub = Dedup.substringDedup(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub(1L) == "alpha beta gamma delta epsilon zeta")
    assert(sub(2L) == "")
    assert(sub(3L) == "" && sub(4L) == "" && sub(5L) == "")

    // coverage: null text → 0 shingles, null coverage — never a crash
    val cov = TextOps.ngramCoverage(d, "doc_id", "text", k = 3, minDf = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.isNullAt(3)))
      .toMap
    assert(cov(3L) == ((0L, true)) && cov(4L) == ((0L, true)))
    assert(cov(1L)._1 == 4L && !cov(1L)._2)

    // sparse cosine: null/empty rows simply contribute no postings
    val pairs = Similarity.sparseCosinePairs(d, "doc_id", "text",
      dfCap = 10, tNum = 1, tDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      "empty docs must never pair (empty-token pollution)")

    // retrieval: only docs containing query terms rank
    val hits = TextOps.searchTopK(d, "doc_id", "text", "alpha", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(hits == Set(1L, 2L))

    // bpe: histogram skips null/empty words entirely
    val merges = TextOps.bpeTrain(d, "text", numMerges = 2).count()
    assert(merges == 2L)
  }

  test("gapFill properties: dense spine, conservation, ffill totality") {
    val gen = Gen.choose(3, 40).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 4L)
      m <- Gen.choose(0L, 2L * 24 * 60) // minutes in a 2-day span
      v <- Gen.choose(-50.0, 50.0)
    } yield (u, m, v)))
    samples(gen, 5).foreach { rows =>
      val ev = rows.zipWithIndex.map { case ((u, m, v), i) =>
        (i.toLong, u, new java.sql.Timestamp(1704067200000L + m * 60000L), v)
      }.toDF("event_id", "user_id", "ts", "value")
      val out = Temporal.gapFill(ev, "user_id", "ts", "value", "event_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)), r.getBoolean(4)))
      val byUser = out.groupBy(_._1)
      val users = rows.map(_._1).distinct
      assert(byUser.keySet == users.toSet, "every key gets a spine")
      byUser.foreach { case (_, bs) =>
        val sorted = bs.sortBy(_._2)
        // spine density: hourly buckets with no holes
        val hours = sorted.map(_._2)
        assert(hours.distinct.size == hours.size, "no duplicate buckets")
        // conservation: per-key event count equals the input's
        // observed flags ⇒ n_events sums to the key's input rows
        // and ffill totality: every bucket from the first observed on
        // has a non-null value (the first bucket is always observed)
        assert(sorted.head._5, "first bucket must be observed")
        assert(sorted.forall(_._4.isDefined), "ffill leaves no null")
      }
      assert(out.map(_._3).sum == rows.size.toLong, "events conserved")
    }
  }

  test("retention/active-user properties: cohort closure and window bounds") {
    val gen = Gen.choose(3, 40).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      day <- Gen.choose(0L, 20L)
    } yield (u, day)))
    samples(gen, 5).foreach { rows =>
      val ev = rows.zipWithIndex.map { case ((u, day), i) =>
        (i.toLong, u,
          new java.sql.Timestamp(1704067200000L + day * 86400000L))
      }.toDF("event_id", "user_id", "ts")
      val users = rows.map(_._1).distinct.size.toLong

      val ret = Temporal.retentionCohorts(ev, "user_id", "ts")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getLong(3)))
      // offset 0 is every cohort member's first week: full retention
      ret.filter(_._2 == 0).foreach { case (cw, _, active, size) =>
        assert(active == size, s"cohort $cw offset-0 must be complete")
      }
      // cohort sizes partition the user base
      assert(ret.filter(_._2 == 0).map(_._4).sum == users)
      // retention never exceeds the cohort
      ret.foreach { case (_, _, active, size) => assert(active <= size) }

      val au = Temporal.rollingActiveUsers(ev, "user_id", "ts", 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      au.foreach { case (_, dau, rolling) =>
        assert(dau <= rolling && rolling <= users,
          s"dau $dau ≤ rolling $rolling ≤ $users")
      }
    }
  }

  test("triangleCounts properties: handshake and triple-count closure") {
    val gen = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(1L, 8L); b <- Gen.choose(1L, 8L)
    } yield (a.min(b), a.max(b)))).map(_.filter(t => t._1 != t._2).distinct)
    samples(gen, 6).filter(_.nonEmpty).foreach { edges =>
      val out = Graph.triangleCounts(edges.toDF("id_a", "id_b"),
        "id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // handshake: Σ degree = 2|E|
      assert(out.map(_._2).sum == 2L * edges.size)
      // each triangle contributes exactly 3 vertex-incidences
      assert(out.map(_._3).sum % 3 == 0, s"triple closure: $out")
    }
  }

  test("quantileNormalize properties: range, monotone within group") {
    val gen = Gen.choose(4, 30).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b"); v <- Gen.choose(-100.0, 100.0)
    } yield (g, v)))
    samples(gen, 5).filter(_.map(_._1).distinct.size == 2).foreach { rows =>
      val out = Features.quantileNormalize(rows.toDF("grp", "v"), "v",
        "grp", gridSize = 10)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
      out.foreach { case (_, _, pct) =>
        assert(pct >= 0 && pct <= 90 && pct % 10 == 0, s"grid: $pct")
      }
      out.groupBy(_._1).foreach { case (_, g) =>
        val sorted = g.sortBy(_._2)
        assert(sorted.map(_._3).sameElements(sorted.map(_._3).sorted),
          "pct must be monotone in the value within a group")
      }
    }
  }

  test("lexicalDiversity ≡ brute-force multiset reference on random corpora") {
    samples(corpusGen, 6).filter(_.nonEmpty).foreach { docs =>
      val got = TextOps.lexicalDiversity(docs.toDF("doc_id", "text"),
        "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r).toMap
      docs.foreach { case (id, text) =>
        val counts = text.split("\\s+").filter(_.nonEmpty)
          .groupBy(identity).values.map(_.length.toLong).toSeq
        val (n, v) = (counts.sum, counts.size.toLong)
        val v1 = counts.count(_ == 1L).toLong
        val s2 = counts.map(c => c * c).sum
        val r = got(id)
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, v, v1)),
          s"doc $id '$text': got ${(r.getLong(1), r.getLong(2), r.getLong(3))}, want ${(n, v, v1)}")
        if (n == 0) assert((4 to 7).forall(r.isNullAt))
        else {
          assert(math.abs(r.getDouble(4) - v.toDouble / n) < 1e-6)
          assert(math.abs(r.getDouble(5) - v1.toDouble / v) < 1e-6)
          assert(math.abs(r.getDouble(6)
            - 1e4 * (s2 - n).toDouble / (n.toDouble * n)) < 1e-4)
          assert(math.abs(r.getDouble(7)
            - n.toDouble * n / s2) < 1e-6)
          // bounds: 1 ≤ eff_vocab ≤ V; V1 ≤ V ≤ n; S2 ≥ n
          assert(r.getDouble(7) >= 1.0 - 1e-9
            && r.getDouble(7) <= v.toDouble + 1e-9)
        }
      }
    }
  }

  test("mergeComponents ≡ full closure on random graphs split into batches") {
    val gen = for {
      nOld <- Gen.choose(1L, 10L)
      nNew <- Gen.choose(1L, 6L)
      oldEdges <- Gen.listOf(for {
        a <- Gen.choose(1L, nOld); b <- Gen.choose(1L, nOld)
      } yield (a.min(b), a.max(b)))
      // batch edges may touch old vertices (cross) or stay intra-batch
      newEdges <- Gen.listOf(for {
        a <- Gen.choose(1L, nOld + nNew); b <- Gen.choose(nOld + 1L, nOld + nNew)
      } yield (a.min(b), a.max(b)))
    } yield (nOld, nNew,
      oldEdges.filter(t => t._1 != t._2).distinct,
      newEdges.filter(t => t._1 != t._2).distinct)
    samples(gen, 8).foreach { case (nOld, nNew, oldE, newE) =>
      val oldVerts = (1L to nOld).toDF("id")
      val allVerts = (1L to (nOld + nNew)).toDF("id")
      val edgesDf = (e: Seq[(Long, Long)]) =>
        e.toDF("id_a", "id_b")
      val base = Dedup.connectedComponents(edgesDf(oldE), oldVerts, "id")
      val merged = Dedup.mergeComponents(base, edgesDf(newE),
        ((nOld + 1L) to (nOld + nNew)).toDF("id"), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val full = Dedup.connectedComponents(edgesDf(oldE ++ newE),
        allVerts, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(merged == full,
        s"nOld=$nOld nNew=$nNew old=$oldE new=$newE:\n$merged\nvs\n$full")
      // re-ingesting an already-labeled batch is a no-op
      val again = Dedup.mergeComponents(full.toDF("id", "component"),
        edgesDf(newE), ((nOld + 1L) to (nOld + nNew)).toDF("id"), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(again == full, s"re-ingest must be idempotent:\n$again")
    }
  }

  test("leakageSafeSplit: component ⇒ split, corpus partitioned, on random cluster maps") {
    val gen = for {
      n <- Gen.choose(5, 40)
      comps <- Gen.listOfN(n, Gen.choose(1L, 6L))
    } yield comps.zipWithIndex.map { case (c, i) => (i.toLong, c) }
    samples(gen, 6).filter(_.nonEmpty).foreach { rows =>
      val docs = rows.map { case (id, _) => (id, s"doc $id") }
        .toDF("doc_id", "text")
      // label components the connectedComponents way: min member id
      val label = rows.groupBy(_._2).values
        .flatMap(g => g.map(t => (t._1, g.map(_._1).min))).toSeq
      val out = Curation.leakageSafeSplit(docs, "doc_id",
        label.toDF("doc_id", "component"))
        .select("doc_id", "component", "split").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(out.length == rows.length, "split must partition the corpus")
      out.groupBy(_._2).foreach { case (c, members) =>
        assert(members.map(_._3).distinct.length == 1,
          s"component $c split across ${members.map(_._3).distinct.toSeq}")
      }
    }
  }

  test("forgetDocs ≡ full recompute over survivors on random signatures") {
    // random 16-perm signatures from a SMALL value pool so band
    // collisions (and thus edges, bridges, splits) actually occur
    val gen = for {
      n <- Gen.choose(4, 16)
      sigs <- Gen.listOfN(n, Gen.listOfN(16, Gen.choose(0L, 2L)))
      delMask <- Gen.listOfN(n, Gen.choose(0, 3))
    } yield (sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) },
      delMask.zipWithIndex.collect { case (0, i) => i.toLong })
    val cols = "id" +: (0 until 16).map(j => s"mh$j")
    def sigDf(rows: Seq[(Long, Seq[Long])]) = {
      val schema = org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.LongType)))
      spark.createDataFrame(spark.sparkContext.parallelize(
        rows.map { case (id, s) =>
          org.apache.spark.sql.Row.fromSeq(id +: s) }), schema)
    }
    def closure(rows: Seq[(Long, Seq[Long])]) = {
      val sigs = sigDf(rows).localCheckpoint()
      val pairs = Dedup.estimatedJaccard(
        Dedup.lshCandidatePairs(sigs, "id"), sigs, "id")
        .filter($"est_jaccard" >= 0.5).select("id_a", "id_b")
      Dedup.connectedComponents(pairs, rows.map(_._1).toDF("id"), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    samples(gen, 6).foreach { case (rows, del) =>
      val labels = closure(rows).toDF("id", "component")
      val got = Dedup.forgetDocs(labels, sigDf(rows), del.toDF("id"), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = closure(rows.filterNot(r => del.contains(r._1)))
      assert(got == want,
        s"del=$del over ${rows.map(_._1)}:\n$got\nvs\n$want")
    }
  }

  test("cusumChangepoints ≡ driver-side recurrence replay on random series") {
    val gen = for {
      n <- Gen.choose(1, 25)
      vs <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield vs
    samples(gen, 8).filter(_.nonEmpty).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) =>
        ("k", java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), v) }
      val got = Temporal.cusumChangepoints(
        rows.toDF("key", "day", "v"), "key", "day", "v")
        .orderBy("day").collect()
        .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
      // independent replay with plain Scala longs
      val mu = 1000000L * vs.sum / vs.length
      val slack = mu / 4; val h = mu * 2
      val want = vs.scanLeft((0L, 0L, false)) {
        case ((sp, sn, cp), v) =>
          val psp = if (cp) 0L else sp
          val psn = if (cp) 0L else sn
          val nsp = math.max(0L, psp + (v * 1000000L - mu - slack))
          val nsn = math.max(0L, psn + (mu - slack - v * 1000000L))
          (nsp, nsn, nsp > h || nsn > h)
      }.tail
      assert(got == want, s"vs=$vs mu=$mu:\n$got\nvs\n$want")
    }
  }
}
