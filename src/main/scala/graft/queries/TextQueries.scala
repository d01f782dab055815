package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.TextOps

/** Text-analysis queries over the `documents` table: token stats,
  * quality scoring, language-ID, fingerprinting. Each has a DuckDB
  * oracle that mirrors the Spark expression shape operation-for-
  * operation (same fold order, same literal-replace occurrence
  * counting) so the hash compare is exact.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  // shared oracle fragments
  private val toksSql = graft.functions.Portable.tokensSql("text")

  val queries: Map[String, Q] = Map(
    // BPE merge training on the corpus word histogram — driver-local
    // trainer (the production path: one histogram job, zero per-merge
    // Spark jobs); BpeLocalSpec pins it bit-equal to the distributed
    // loop, and the DuckDB oracle re-derives it independently here
    // (the EXACT full-vocabulary form by name — the oracle replays
    // the unbounded histogram; the default-bounded bpeTrainLocal is
    // the production entry since the r14 default flip)
    "q_bpe_merges" -> ((s, d) =>
      TextOps.bpeTrainExact(Tables.documents(s, d), "text", numMerges = 8)
        .orderBy("rank")),

    // the trained segmentation table (the encoder lookup at scale)
    "q_bpe_segment" -> ((s, d) =>
      TextOps.bpeSegmentationExact(Tables.documents(s, d), "text",
        numMerges = 8)
        .orderBy("word")),

    // corpus encoded through the trained table: per-doc token budget
    "q_bpe_encode" -> ((s, d) =>
      TextOps.bpeEncodeCountsExact(Tables.documents(s, d), "doc_id", "text",
        numMerges = 8)
        .orderBy("doc_id")),

    // per-source tokenizer fertility (subwords per whitespace word)
    "q_bpe_fertility" -> ((s, d) =>
      TextOps.bpeFertility(Tables.documents(s, d), "doc_id", "text",
        "source", numMerges = 8, minFreq = 1L, maxVocab = Int.MaxValue)
        .orderBy("source")),

    // chi-square language-mix drift across sources: per (source, lang)
    // cell observed/expected/χ²-term, structural zeros included — the
    // batch-over-batch distribution-shift monitor
    "q_drift" -> ((s, d) =>
      graft.operators.Features.categoricalDrift(Tables.documents(s, d),
          "source", "lang")
        .orderBy("slice", "category")),

    // term-level drift: WHICH tokens shifted between two sources —
    // chi-square over the exploded token mix, top cells by
    // contribution (the actionable readout of a vocabulary shift)
    "q_term_drift" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source").as("slice"),
          explode(graft.functions.Portable.tokens(col("text")))
            .as("category"))
        .filter(length(col("category")) > 0)
      graft.operators.Features.categoricalDrift(toks, "slice", "category")
        .orderBy(col("chi2_term").desc, col("slice"), col("category"))
        .limit(40)
    }),

    // n-gram coverage: the LM-lite fluency gate
    "q_ngram_coverage" -> ((s, d) =>
      TextOps.ngramCoverage(Tables.documents(s, d), "doc_id", "text",
        k = 3, minDf = 3)
        .orderBy("doc_id")),

    // token statistics — one narrow pass, no shuffle
    "q_text_stats" -> ((s, d) =>
      TextOps.withTokenStats(Tables.documents(s, d), "text")
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_distinct_tokens").cast("long").as("n_distinct_tokens"),
          round(col("avg_token_len"), 6).as("avg_token_len"))
        .orderBy("doc_id")),

    // lexical-richness profile — zero-shuffle sorted-run fold
    "q_lexical_diversity" -> ((s, d) =>
      TextOps.lexicalDiversity(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // quality scoring — ratio features + weighted composite
    "q_text_quality" -> ((s, d) =>
      TextOps.withQuality(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("distinct_ratio"), col("stopword_ratio"),
          col("non_alnum_ratio"), col("quality_score"))
        .orderBy("doc_id")),

    // language-ID via marker-occurrence argmax
    "q_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextOps.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // cross-source percentile calibration of doc length (vigintiles)
    "q_quantile_norm" -> ((s, d) =>
      graft.operators.Features.quantileNormalize(
        Tables.documents(s, d).select("doc_id", "source", "n_chars"),
        "n_chars", "source", gridSize = 20)
        .orderBy("doc_id")),

    // classifier evaluation: labeled lang × predicted lang counts.
    // The repartition is load-bearing: grouping directly on the
    // languageId expression inlines its O(langs²) argmax when-chain
    // into the aggregate's KEY evaluation, where codegen does no
    // subexpression elimination — measured 20× slower. The exchange
    // pins the prediction to a Project below it (CSE applies, one
    // evaluation per row) and the aggregate sees plain attributes.
    "q_langid_confusion" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), TextOps.languageId(col("text")).as("lang_pred"))
        .repartition(col("lang"), col("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
        .withColumn("correct", col("lang") === col("lang_pred"))
        .orderBy("lang", "lang_pred")),

    // inverted index: token → exact doc_freq + bounded sorted postings
    "q_inverted_index" -> ((s, d) =>
      TextOps.invertedIndex(Tables.documents(s, d), "doc_id", "text", 20)
        .orderBy("token")),

    // order-sensitive rolling-hash fingerprint
    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // BPE-ish subword token counting
    "q_bpe_tokens" -> ((s, d) => {
      val t = TextOps.bpeTokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(t).cast("long").as("n_bpe"),
          size(array_distinct(t)).cast("long").as("n_bpe_distinct"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition fractions + composite pass flag
    "q_repetition" -> ((s, d) =>
      TextOps.repetitionStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // CCNet-style bigram-LM quality score (integer micro-units;
    // self-scored here — production trains on a clean reference corpus)
    "q_lm_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.bigramLmScore(docs, docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // CCNet head/middle/tail: tercile-bucket each source by LM fluency.
    // exactNtile = oracle mode (DuckDB ntile tie-parity); the
    // production default is the windowless quantile-cutoff form,
    // spec-pinned against this one in BpeLocalSpec + PlanAuditSpec
    "q_lm_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.lmQualityBuckets(docs, docs, "doc_id", "text", "source",
        exactNtile = true)
        .orderBy("doc_id")
    }),

    // corpus-wide boilerplate 3-grams present in ≥ 5 docs
    "q_boilerplate" -> ((s, d) =>
      TextOps.boilerplateNgrams(Tables.documents(s, d), "doc_id", "text",
        k = 3, minDocs = 5)
        .orderBy("shingle")),

    // per-source top-5 characteristic terms (log-free tf-idf, ranked
    // through the GroupedTopK heap operator)
    // the MAINTAINED tf-idf lifecycle: term statistics bootstrapped
    // from 90% of the corpus as three stored views (tf per
    // (source, term), df per term, corpus N — all additive, so the
    // whole CDC refresh is pure arithmetic: the one maintained view
    // family with NO dirty-group recompute at all), then one batch
    // that deletes docs %17==3 and ingests the held-out tenth, served
    // from the stored state. Must EQUAL topTerms over the final
    // corpus (refresh ≡ recompute — the oracle recomputes from
    // scratch over exactly the surviving docs).
    "q_incr_tfidf" -> ((s, d) => {
      val all = Tables.documents(s, d)
      val base = all.filter(col("doc_id") % 10 =!= 9)
      val dir = Scratch.fresh(s"tfidf_${Scratch.tag(d)}/state")
      TextOps.writeTermStats(base, "doc_id", "text", "source", dir)
      TextOps.refreshTermStats(s, dir,
        removedDocs = base.filter(col("doc_id") % 17 === 3),
        addedDocs = all.filter(col("doc_id") % 10 === 9 &&
          col("doc_id") % 17 =!= 3),
        "doc_id", "text", "source", batchId = 1L)
      TextOps.topTermsFromStats(s, dir, "source", k = 5)
        .orderBy("source", "rk")
    }),

    "q_top_terms" -> ((s, d) =>
      TextOps.topTerms(Tables.documents(s, d), "doc_id", "text", "source",
        k = 5)
        .orderBy("source", "rk")),

    // corpus top-20 PMI collocations (min pair count 5)
    "q_pmi" -> ((s, d) =>
      TextOps.collocationsPmi(Tables.documents(s, d), "doc_id", "text",
        minPair = 5L, k = 20)
        .orderBy("rk")),

    // per-doc top-3 tf-idf keywords
    "q_doc_keywords" -> ((s, d) =>
      TextOps.docKeywords(Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rk")),

    // boilerplate REMOVAL: cut every occurrence of a corpus-frequent
    // 3-gram span, rebuild the text from surviving tokens
    "q_strip_boilerplate" -> ((s, d) =>
      TextOps.stripBoilerplate(Tables.documents(s, d), "doc_id", "text",
        k = 3, minDocs = 5)
        .orderBy("doc_id")),

    // keyword retrieval: integer micro-unit tf-idf top-10
    "q_retrieval" -> ((s, d) =>
      TextOps.searchTopK(Tables.documents(s, d), "doc_id", "text",
        "hash join filter", k = 10)
        .orderBy("rank")),

    // BM25 over the same postings: tf saturation + length
    // normalization in one integer rational (k1=1.2, b=0.75 folded),
    // per-doc sums stay order-free integers
    "q_bm25" -> ((s, d) =>
      TextOps.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        "hash join filter", k = 10)
        .orderBy("rank")),

    // hybrid retrieval: BM25 top-20 and vector-KNN top-20 (query =
    // vec 0's embedding; doc_id ≡ vec_id in this corpus) fused by
    // integer reciprocal-rank fusion (10⁶ div (60 + rank)) — the
    // standard lexical+semantic combiner
    "q_hybrid_rrf" -> ((s, d) => {
      val bm = TextOps.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        "hash join filter", k = 20)
        .select(col("doc_id").as("id"), col("rank").as("bm25_rank"))
      val e = Tables.embeddings(s, d)
      val knn = graft.operators.Similarity.bruteForceTopK(
        e.filter(col("vec_id") === 0L), e, "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("id"), col("rank").as("knn_rank"))
      TextOps.rrfFuse(bm, knn, "id", "bm25_rank", "knn_rank", k = 10)
        .orderBy("rank")
    }),

    // LSH recall diagnostic: ground truth (integer-exact jaccard ≥
    // 1/2) vs the banding candidates, one report row
    "q_lsh_recall" -> ((s, d) =>
      graft.operators.Dedup.lshRecallReport(Tables.documents(s, d),
        "doc_id", "text", k = 3)),

    // PII audit report: per-source match counts for each redaction
    // pattern over deterministically adorned docs (the pre-flight a
    // redaction pass runs to size its blast radius)
    "q_pii_report" -> ((s, d) => {
      val adorned = concat(col("text"),
        lit(" contact: user"), col("doc_id").cast("string"),
        lit("@example.com tel: +1 555 123 4567 ip: 10.0.0."),
        (col("doc_id") % 256).cast("string"))
      Tables.documents(s, d)
        .select(col("source"),
          TextOps.piiCount(adorned, TextOps.emailPattern).as("e"),
          TextOps.piiCount(adorned, TextOps.phonePattern).as("p"),
          TextOps.piiCount(adorned, TextOps.ipv4Pattern).as("i"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("e")).as("n_emails"),
          sum(col("p")).as("n_phones"),
          sum(col("i")).as("n_ips"))
        .orderBy("source")
    }),

    // cleanup pipeline: strip HTML → redact PII → NFC-normalize (the
    // native codegen'd expression), over docs deterministically
    // adorned with markup, an email, a phone, an IP, and a decomposed
    // é — so every cleanup stage provably fires
    "q_normalize" -> ((s, d) => {
      val adorned = concat(col("text"),
        lit(" <b>footer</b> contact: user"),
        col("doc_id").cast("string"), lit("@example.com"),
        lit(" tel: +1 555 123 4567 ip: 10.0.0."),
        (col("doc_id") % 256).cast("string"), lit(" cafe\u0301")) // decomposed e + U+0301
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.expressions.TextExpressions.nfcNormalize(
            TextOps.redactPii(TextOps.stripHtml(adorned))).as("clean"),
          TextOps.piiCount(adorned, TextOps.emailPattern).cast("long")
            .as("n_emails"))
        .orderBy("doc_id")
    }),

    // model-based quality filter: 3-epoch batch perceptron on hashed
    // binary token features, weak prose labels from the corpus itself
    // (integer arithmetic throughout — the DuckDB oracle replays the
    // identical epochs, so training itself is hash-verified)
    "q_quality_classifier" -> ((s, d) =>
      graft.operators.Classify.perceptronQuality(
        Tables.documents(s, d), "doc_id", "text",
        buckets = 1024, epochs = 3, minStop = 2)
        .orderBy("doc_id")),

    // held-out evaluation of the model gate: train the epoch-1
    // discriminant on the hash-split train docs (the same
    // bucket(doc_id) < 80 predicate q_dataset_split uses), take the
    // TRAIN mean margin as threshold, score the complement the model
    // never saw, report the per-source confusion vs the weak labels —
    // the threshold-tuning artifact a CCNet-style filter is judged by
    "q_classifier_eval" -> ((s, d) =>
      graft.operators.Classify.marginGateEval(
        Tables.documents(s, d), "doc_id", "text", "source",
        buckets = 1024, minStop = 2, trainPct = 80)
        .orderBy("source")),

    // calibration of the epoch-1 ranker: per margin-bucket label
    // shares — monotone pos_share is what justifies treating the
    // margin as a quality SCORE (budgets, ranking), not just a sign
    "q_calibration" -> ((s, d) =>
      graft.operators.Classify.calibration(
        Tables.documents(s, d), "doc_id", "text",
        buckets = 1024, epochs = 1, minStop = 2, step = 256, clamp = 16)),

    // curriculum order: global rank by descending model quality —
    // stamped by the distributed sort+zipWithIndex, never a
    // single-partition window
    "q_curriculum" -> ((s, d) =>
      graft.operators.Curation.curriculumOrder(
        Tables.documents(s, d), "doc_id", "text")
        .orderBy("rid")),
  )

  /** BM25 scored-docs CTE chain ending in `sc(doc_id, score,
    * n_terms)` — shared by q_bm25 and the hybrid-RRF oracle so the
    * scoring formula can only change in one place.
    */
  private[queries] val bm25ScCte: String =
    s"""docs AS (SELECT doc_id, $toksSql AS t FROM documents),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM docs),
       |st AS (SELECT count(*) AS nn, CAST(sum(dl) AS BIGINT) AS tt
       |  FROM dl),
       |tf AS (SELECT d.doc_id, dl.dl, tok AS token, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM docs) d
       |  JOIN dl USING (doc_id)
       |  WHERE tok IN ('hash', 'join', 'filter') GROUP BY 1, 2, 3),
       |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |    CAST(sum(((st.nn * 1000000) // dfq.df) *
       |      ((44000 * st.tt * tf.tf) //
       |       (20 * st.tt * tf.tf + 6 * st.tt + 18 * tf.dl * st.nn)))
       |      AS BIGINT) AS score,
       |    count(*) AS n_terms
       |  FROM tf JOIN dfq USING (token) CROSS JOIN st GROUP BY 1)""".stripMargin

  private def langScoreSql(lang: String, markers: Seq[String]): String =
    markers.map { m =>
      val esc = m.replace("'", "''")
      s"(len(p) - len(replace(p, '$esc', ''))) / ${m.length}"
    }.mkString("(", " + ", s") AS s_$lang")

  private val langPredSql: String = {
    val langs = TextOps.langProfiles.map(_._1)
    val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val arms = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
    s"CASE WHEN mx <= 0 THEN 'und' $arms END"
  }

  /** Unrolled-round mirror of [[TextOps.bpeTrain]]. The Spark fold's
    * greedy left-to-right non-overlap is expressed relationally as the
    * PARITY RULE: within each maximal run of consecutive match
    * positions, merge the 1st, 3rd, 5th… (runs longer than 1 only
    * happen when lhs == rhs, and there the fold provably merges at
    * even offsets — same set). Each round is three CTEs: pair
    * argmax → kept match positions → rebuilt segmentation.
    */
  private def bpeOracleSql(numMerges: Int): String = {
    val init =
      s"""words AS MATERIALIZED (SELECT word, count(*) AS freq FROM (
         |    SELECT unnest($toksSql) AS word FROM documents)
         |  WHERE len(word) > 0 GROUP BY 1),
         |seg0 AS MATERIALIZED (SELECT word, freq,
         |  list_transform(generate_series(1, len(word)), i -> word[i]) AS seg
         |  FROM words)""".stripMargin
    val rounds = (1 to numMerges).map { r =>
      val prev = s"seg${r - 1}"
      s"""pc$r AS MATERIALIZED (SELECT seg[i] AS a, seg[i + 1] AS b,
         |    CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, seg, unnest(generate_series(1, len(seg) - 1))
         |          AS i FROM $prev WHERE len(seg) > 1)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT a, b, cnt FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1),
         |pos$r AS MATERIALIZED (SELECT word, freq, seg,
         |    unnest(generate_series(1, len(seg))) AS i FROM $prev),
         |mt$r AS MATERIALIZED (SELECT p.word, p.i FROM pos$r p, m$r m
         |  WHERE p.i < len(p.seg) AND p.seg[p.i] = m.a
         |    AND p.seg[p.i + 1] = m.b),
         |kp$r AS MATERIALIZED (SELECT word, i FROM (
         |  SELECT word, i, row_number()
         |      OVER (PARTITION BY word, i - rn ORDER BY i) AS rk
         |  FROM (SELECT word, i, row_number()
         |          OVER (PARTITION BY word ORDER BY i) AS rn FROM mt$r))
         |  WHERE rk % 2 = 1),
         |seg$r AS MATERIALIZED (SELECT p.word, p.freq,
         |    list(CASE WHEN k.i IS NOT NULL THEN p.seg[p.i] || p.seg[p.i + 1]
         |              ELSE p.seg[p.i] END ORDER BY p.i) AS seg
         |  FROM pos$r p
         |  LEFT JOIN kp$r k ON k.word = p.word AND k.i = p.i
         |  LEFT JOIN kp$r k2 ON k2.word = p.word AND k2.i = p.i - 1
         |  WHERE k2.i IS NULL
         |  GROUP BY p.word, p.freq)""".stripMargin
    }
    val out = (1 to numMerges)
      .map(r => s"SELECT CAST($r AS INT) AS rank, a AS lhs, b AS rhs, cnt FROM m$r")
      .mkString("\nUNION ALL ")
    s"""WITH $init,
       |${rounds.mkString(",\n")}
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** Same unrolled rounds, selecting the final segmentation instead of
    * the merge list — the [[TextOps.bpeSegmentation]] mirror.
    */
  private def bpeSegOracleSql(numMerges: Int): String = {
    val body = bpeOracleSql(numMerges)
    val withPart = body.substring(0, body.lastIndexOf("SELECT CAST(1 AS INT)"))
    s"""${withPart.trim.stripSuffix(",")}
       |SELECT word, freq, array_to_string(seg, '␟') AS seg_csv
       |FROM seg$numMerges
       |ORDER BY word""".stripMargin
  }

  /** Encode mirror: per-doc word/subword counts through seg8. */
  private def bpeEncodeOracleSql(numMerges: Int): String = {
    val body = bpeOracleSql(numMerges)
    val withPart = body.substring(0, body.lastIndexOf("SELECT CAST(1 AS INT)"))
    s"""${withPart.trim.stripSuffix(",")}
       |, docw AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |dw AS (SELECT doc_id, word FROM docw WHERE len(word) > 0)
       |SELECT dw.doc_id, count(*) AS n_words,
       |  CAST(sum(len(s.seg)) AS BIGINT) AS n_subwords
       |FROM dw JOIN seg$numMerges s ON s.word = dw.word
       |GROUP BY dw.doc_id
       |ORDER BY dw.doc_id""".stripMargin
  }

  /** Fertility mirror: per-source subword/word ratio through seg8. */
  private def bpeFertilityOracleSql(numMerges: Int): String = {
    val body = bpeOracleSql(numMerges)
    val withPart = body.substring(0, body.lastIndexOf("SELECT CAST(1 AS INT)"))
    s"""${withPart.trim.stripSuffix(",")}
       |, docw AS (SELECT doc_id, source, unnest($toksSql) AS word
       |    FROM documents),
       |dw AS (SELECT doc_id, source, word FROM docw WHERE len(word) > 0),
       |perdoc AS (SELECT dw.doc_id, dw.source, count(*) AS n_words,
       |    CAST(sum(len(s.seg)) AS BIGINT) AS n_subwords
       |  FROM dw JOIN seg$numMerges s ON s.word = dw.word
       |  GROUP BY 1, 2)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS n_words,
       |  CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
       |  round(CAST(sum(n_subwords) AS DOUBLE) / sum(n_words), 6)
       |    AS fertility
       |FROM perdoc GROUP BY source ORDER BY source""".stripMargin
  }

  // add-one bigram LM in integer ppm — mirrors TextOps.bigramLmScore:
  // p = (10^6*(c2+1)) // (c1+V); doc = (count, sum, sum // count).
  // Inner joins are exact here because the score corpus IS the train
  // corpus (every scored bigram exists in the model). Shared by
  // q_lm_score and q_lm_buckets so the two oracles cannot drift.
  private val lmCtes =
    s"""tok0 AS (SELECT doc_id,
       |    list_filter($toksSql, t -> len(t) > 0) AS t FROM documents),
       |bg0 AS (SELECT doc_id, t,
       |    unnest(generate_series(1, len(t) - 1)) AS i
       |  FROM tok0 WHERE len(t) >= 2),
       |bg AS (SELECT doc_id, t[i] AS prev, t[i+1] AS cur FROM bg0),
       |tk AS (SELECT unnest(t) AS tok FROM tok0),
       |c2 AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT tok AS prev, count(*) AS c1 FROM tk GROUP BY 1),
       |v AS (SELECT count(DISTINCT tok) AS v FROM tk),
       |p AS (SELECT b.doc_id,
       |    (1000000 * (c2.c2 + 1)) // (c1.c1 + v.v) AS ppm
       |  FROM bg b JOIN c2 USING (prev, cur) JOIN c1 USING (prev), v),
       |lm AS (SELECT doc_id, count(*) AS n_bigrams,
       |    CAST(sum(ppm) AS BIGINT) AS sum_ppm,
       |    CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm
       |  FROM p GROUP BY 1)""".stripMargin

  /** Chi-square drift oracle over a `cells` CTE (slice, category, n)
    * — mirrors Features.categoricalDriftFromCounts' expression tree
    * exactly; `tail` is the consumer's ORDER BY / LIMIT.
    */
  private def driftSql(cellsSql: String, tail: String): String =
    s"""WITH $cellsSql,
       |rt AS (SELECT category, CAST(sum(n) AS BIGINT) AS rt
       |  FROM cells GROUP BY 1),
       |ct AS (SELECT slice, CAST(sum(n) AS BIGINT) AS ct
       |  FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cells),
       |dense AS (SELECT ct.slice, rt.category,
       |    COALESCE(c.n, 0) AS n, rt.rt, ct.ct
       |  FROM rt CROSS JOIN ct
       |  LEFT JOIN cells c ON c.slice IS NOT DISTINCT FROM ct.slice
       |    AND c.category IS NOT DISTINCT FROM rt.category)
       |SELECT slice, category, CAST(n AS BIGINT) AS n,
       |  round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
       |    / (SELECT CAST(tot AS DOUBLE) FROM tot), 6) AS expected,
       |  round((CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
       |      / (SELECT CAST(tot AS DOUBLE) FROM tot))
       |    * (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
       |      / (SELECT CAST(tot AS DOUBLE) FROM tot))
       |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
       |      / (SELECT CAST(tot AS DOUBLE) FROM tot)), 6) AS chi2_term
       |FROM dense $tail""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_drift" -> driftSql(
      """cells AS (SELECT source AS slice, lang AS category,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2)""".stripMargin,
      "ORDER BY slice, category"),

    "q_term_drift" -> driftSql(
      s"""dtoks AS (SELECT source AS slice,
         |    unnest(${graft.functions.Portable.tokensSql("text")})
         |      AS category
         |  FROM documents WHERE source IN ('src0', 'src1')),
         |cells AS (SELECT slice, category, CAST(count(*) AS BIGINT) AS n
         |  FROM dtoks WHERE len(category) > 0 GROUP BY 1, 2)""".stripMargin,
      "ORDER BY chi2_term DESC, slice, category LIMIT 40"),

    "q_lm_score" ->
      s"""WITH $lmCtes
         |SELECT doc_id, n_bigrams, sum_ppm, avg_ppm
         |FROM lm ORDER BY doc_id""".stripMargin,

    // CCNet tercile bucketing over the same lm table; the ntile order
    // (avg_ppm DESC, doc_id) is total, so buckets are engine-portable
    "q_lm_buckets" ->
      s"""WITH $lmCtes
         |SELECT l.doc_id, d.source, l.n_bigrams, l.avg_ppm,
         |  CAST(ntile(3) OVER (PARTITION BY d.source
         |    ORDER BY l.avg_ppm DESC, l.doc_id) AS INT) AS bucket
         |FROM lm l JOIN documents d USING (doc_id)
         |ORDER BY l.doc_id""".stripMargin,

    "q_bpe_merges" -> bpeOracleSql(8),
    "q_bpe_segment" -> bpeSegOracleSql(8),
    "q_bpe_encode" -> bpeEncodeOracleSql(8),
    "q_bpe_fertility" -> bpeFertilityOracleSql(8),

    // mirror of TextOps.ngramCoverage(k=3, minDf=3): known = shingle in
    // ≥ minDf+1 docs total (the doc counts itself once)
    "q_ngram_coverage" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh0 AS (SELECT doc_id,
         |  unnest(${graft.functions.Portable.shinglesSql("t", 3)}) AS s
         |  FROM toks),
         |sh AS (SELECT DISTINCT doc_id, s FROM sh0),
         |common AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 4),
         |known AS (SELECT doc_id, count(*) AS n_known
         |  FROM sh JOIN common USING (s) GROUP BY 1),
         |totals AS (SELECT doc_id, count(*) AS n_shingles
         |  FROM sh GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(t.n_shingles, 0) AS n_shingles,
         |  coalesce(k.n_known, 0) AS n_known,
         |  round(CAST(coalesce(k.n_known, 0) AS DOUBLE) / t.n_shingles, 6)
         |    AS coverage
         |FROM documents d
         |LEFT JOIN totals t USING (doc_id)
         |LEFT JOIN known k USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q_text_stats" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
         |  round(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
         |        / CAST(len(t) AS DOUBLE), 6) AS avg_token_len
         |FROM toks ORDER BY doc_id""".stripMargin,

    // the oracle derives the same multiset statistics through the
    // orthodox unnest+group shape — counts are counts whichever way
    // they're folded, and every compared ratio is exact-integer math
    "q_lexical_diversity" ->
      s"""WITH lx AS (SELECT doc_id,
         |    list_filter($toksSql, t -> len(t) > 0) AS t FROM documents),
         |lxc AS (SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(t) AS tok FROM lx) GROUP BY 1, 2),
         |lxa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS v,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         |    CAST(sum(c * c) AS BIGINT) AS s2
         |  FROM lxc GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.n, 0) AS n_tokens,
         |  coalesce(a.v, 0) AS n_types,
         |  coalesce(a.v1, 0) AS n_hapax,
         |  CASE WHEN coalesce(a.n, 0) = 0 THEN NULL
         |    ELSE round(CAST(a.v AS DOUBLE) / CAST(a.n AS DOUBLE), 6)
         |    END AS ttr,
         |  CASE WHEN coalesce(a.v, 0) = 0 THEN NULL
         |    ELSE round(CAST(a.v1 AS DOUBLE) / CAST(a.v AS DOUBLE), 6)
         |    END AS hapax_ratio,
         |  CASE WHEN coalesce(a.n, 0) = 0 THEN NULL
         |    ELSE round(10000.0 * CAST(a.s2 - a.n AS DOUBLE)
         |      / CAST(a.n * a.n AS DOUBLE), 6) END AS yule_k,
         |  CASE WHEN coalesce(a.s2, 0) = 0 THEN NULL
         |    ELSE round(CAST(a.n * a.n AS DOUBLE) / CAST(a.s2 AS DOUBLE), 6)
         |    END AS eff_vocab
         |FROM documents d LEFT JOIN lxa a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_text_quality" -> {
      val stopList = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH toks AS (SELECT doc_id, text, $toksSql AS t FROM documents),
         |feat AS (SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS dr,
         |  CAST(len(list_filter(t, x -> x IN ($stopList))) AS DOUBLE)
         |    / CAST(len(t) AS DOUBLE) AS sr,
         |  CAST(len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
         |       AS DOUBLE) / CAST(len(text) AS DOUBLE) AS nar
         |  FROM toks)
         |SELECT doc_id, n_tokens, round(dr, 6) AS distinct_ratio,
         |  round(sr, 6) AS stopword_ratio, round(nar, 6) AS non_alnum_ratio,
         |  round(0.4 * dr + 0.3 * sr + 0.3 * (1.0 - nar), 6) AS quality_score
         |FROM feat ORDER BY doc_id""".stripMargin
    },

    "q_langid" -> {
      val scores = TextOps.langProfiles
        .map { case (l, ms) => langScoreSql(l, ms) }.mkString(",\n  ")
      s"""WITH padded AS (SELECT doc_id, lang,
         |    ' ' || lower(text) || ' ' AS p FROM documents),
         |scored AS (SELECT doc_id, lang,
         |  $scores
         |  FROM padded),
         |m AS (SELECT *, greatest(${TextOps.langProfiles.map("s_" + _._1).mkString(", ")}) AS mx
         |  FROM scored)
         |SELECT doc_id, lang, $langPredSql AS lang_pred
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q_quantile_norm" -> {
      val ps = (1 until 20).map(i => (i.toDouble / 20).toString)
        .mkString(", ")
      s"""WITH cuts AS (SELECT source,
         |    quantile_cont(n_chars, [$ps]) AS c
         |  FROM documents GROUP BY 1)
         |SELECT d.doc_id, d.source, d.n_chars,
         |  CAST(len(list_filter(list_transform(cuts.c, x -> round(x, 6)),
         |    x -> x <= d.n_chars)) * 5 AS INT) AS pct
         |FROM documents d JOIN cuts USING (source)
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_langid_confusion" -> {
      val scores = TextOps.langProfiles
        .map { case (l, ms) => langScoreSql(l, ms) }.mkString(",\n  ")
      s"""WITH padded AS (SELECT doc_id, lang,
         |    ' ' || lower(text) || ' ' AS p FROM documents),
         |scored AS (SELECT doc_id, lang,
         |  $scores
         |  FROM padded),
         |m AS (SELECT *, greatest(${TextOps.langProfiles.map("s_" + _._1).mkString(", ")}) AS mx
         |  FROM scored),
         |pred AS (SELECT lang, $langPredSql AS lang_pred FROM m)
         |SELECT lang, lang_pred, count(*) AS n,
         |  lang = lang_pred AS correct
         |FROM pred GROUP BY 1, 2
         |ORDER BY lang, lang_pred""".stripMargin
    },

    "q_inverted_index" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |td AS (SELECT doc_id, unnest(list_distinct(t)) AS token FROM toks)
         |SELECT token, count(*) AS doc_freq,
         |  array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings
         |FROM td GROUP BY token ORDER BY token""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id, ${TextOps.fingerprintSql("text")} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_bpe_tokens" -> {
      val pat = TextOps.bpePattern.replace("'", "''")
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_bpe,
         |  CAST(len(list_distinct(regexp_extract_all(text, '$pat'))) AS BIGINT)
         |    AS n_bpe_distinct
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_repetition" -> {
      val toks = graft.functions.Portable.tokensSql("text")
      def statsCte(n: Int) =
        s"""g$n AS (SELECT doc_id,
           |  unnest(${graft.functions.Portable.shinglesSql("t", n)}) AS g
           |  FROM toks),
           |c$n AS (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY 1, 2),
           |s$n AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot,
           |  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
           |  FROM c$n GROUP BY 1)""".stripMargin
      s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
         |${statsCte(2)},
         |${statsCte(3)},
         |${statsCte(5)}
         |SELECT d.doc_id,
         |  round(CAST(s2.mx AS DOUBLE) / s2.tot, 6) AS top_bigram_frac,
         |  round(CAST(s3.mx AS DOUBLE) / s3.tot, 6) AS top_trigram_frac,
         |  round(CAST(s5.dup AS DOUBLE) / s5.tot, 6) AS dup_5gram_frac,
         |  (coalesce(round(CAST(s2.mx AS DOUBLE) / s2.tot, 6), 0.0) <= 0.20
         |   AND coalesce(round(CAST(s3.mx AS DOUBLE) / s3.tot, 6), 0.0) <= 0.18
         |   AND coalesce(round(CAST(s5.dup AS DOUBLE) / s5.tot, 6), 0.0) <= 0.15)
         |    AS gopher_pass
         |FROM documents d
         |LEFT JOIN s2 ON s2.doc_id = d.doc_id
         |LEFT JOIN s3 ON s3.doc_id = d.doc_id
         |LEFT JOIN s5 ON s5.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_normalize" -> {
      val email = TextOps.emailPattern
      val phone = TextOps.phonePattern
      val ip = TextOps.ipv4Pattern
      val html = TextOps.htmlTagPattern
      s"""WITH a AS (SELECT doc_id,
         |    text || ' <b>footer</b> contact: user' || doc_id
         |      || '@example.com tel: +1 555 123 4567 ip: 10.0.0.'
         |      || (doc_id % 256) || ' cafe' || chr(769) AS adorned
         |  FROM documents),
         |stripped AS (SELECT doc_id, adorned,
         |    trim(regexp_replace(regexp_replace(adorned, '$html', ' ', 'g'),
         |      '[ \\t\\r\\n]+', ' ', 'g')) AS s
         |  FROM a)
         |SELECT doc_id,
         |  nfc_normalize(regexp_replace(regexp_replace(regexp_replace(s,
         |    '$email', '[EMAIL]', 'g'),
         |    '$phone', '[PHONE]', 'g'),
         |    '$ip', '[IP]', 'g')) AS clean,
         |  CAST(len(regexp_extract_all(adorned, '$email')) AS BIGINT)
         |    AS n_emails
         |FROM stripped ORDER BY doc_id""".stripMargin
    },

    // DuckDB `//` floors where Spark `div` truncates — identical for
    // the all-positive operands here
    "q_retrieval" ->
      s"""WITH n AS (SELECT count(*) AS nn FROM documents),
         |tf AS (SELECT doc_id, tok AS token, count(*) AS tf FROM (
         |    SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |  WHERE tok IN ('hash', 'join', 'filter') GROUP BY 1, 2),
         |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |    CAST(sum(tf.tf * ((n.nn * 1000000) // dfq.df)) AS BIGINT)
         |      AS score,
         |    count(*) AS n_terms
         |  FROM tf JOIN dfq USING (token) CROSS JOIN n GROUP BY 1)
         |SELECT CAST(row_number() OVER w AS INT) AS rank, doc_id, score,
         |  n_terms
         |FROM sc
         |WINDOW w AS (ORDER BY score DESC, doc_id)
         |QUALIFY row_number() OVER w <= 10
         |ORDER BY rank""".stripMargin,

    // BM25 in the same integer units: tfsat = 44·T·tf // (20·T·tf +
    // 6·T + 18·dl·N) ×1000 (k1=6/5, b=3/4 folded), idf log-free
    "q_bm25" ->
      s"""WITH $bm25ScCte
         |SELECT CAST(row_number() OVER w AS INT) AS rank, doc_id, score,
         |  n_terms
         |FROM sc
         |WINDOW w AS (ORDER BY score DESC, doc_id)
         |QUALIFY row_number() OVER w <= 10
         |ORDER BY rank""".stripMargin,

    "q_lsh_recall" -> {
      val sig = DedupQueries.sigCteFrom("documents")
      val bands = DedupQueries.bandsCteText
      s"""WITH $sig,
         |$bands,
         |cand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS id_a,
         |    y.doc_id AS id_b
         |  FROM bands x JOIN bands y ON x.band_key = y.band_key
         |  WHERE x.doc_id < y.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    count(*) AS ni
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS MATERIALIZED (SELECT i.id_a, i.id_b FROM inter i
         |  JOIN sizes na ON na.doc_id = i.id_a
         |  JOIN sizes nb ON nb.doc_id = i.id_b
         |  WHERE 2 * i.ni >= (na.n + nb.n - i.ni)),
         |hit AS (SELECT e.id_a FROM ex e
         |  JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b)
         |SELECT (SELECT count(*) FROM ex) AS n_exact,
         |  (SELECT count(*) FROM cand) AS n_candidates,
         |  (SELECT count(*) FROM hit) AS n_hit,
         |  round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
         |        / (SELECT count(*) FROM ex), 6) AS recall""".stripMargin
    },

    "q_pii_report" -> {
      val email = TextOps.emailPattern
      val phone = TextOps.phonePattern
      val ip = TextOps.ipv4Pattern
      s"""WITH a AS (SELECT source,
         |    text || ' contact: user' || doc_id
         |      || '@example.com tel: +1 555 123 4567 ip: 10.0.0.'
         |      || (doc_id % 256) AS adorned
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(len(regexp_extract_all(adorned, '$email'))) AS BIGINT)
         |    AS n_emails,
         |  CAST(sum(len(regexp_extract_all(adorned, '$phone'))) AS BIGINT)
         |    AS n_phones,
         |  CAST(sum(len(regexp_extract_all(adorned, '$ip'))) AS BIGINT)
         |    AS n_ips
         |FROM a GROUP BY source ORDER BY source""".stripMargin
    },

    "q_boilerplate" -> {
      val sh3 = graft.functions.Portable.shinglesSql("t", 3)
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, unnest($sh3) AS shingle FROM toks)
         |SELECT shingle, count(*) AS n_docs FROM sh
         |GROUP BY 1 HAVING count(*) >= 5 ORDER BY shingle""".stripMargin
    },

    // refresh ≡ recompute: the oracle is q_top_terms' SQL over the
    // SURVIVING corpus (everything except doc_id % 17 = 3 — base
    // minus the forget batch plus the ingested tenth)
    "q_incr_tfidf" ->
      s"""WITH docs AS (SELECT * FROM documents WHERE doc_id % 17 <> 3),
         |toks AS (SELECT doc_id, source, unnest($toksSql) AS tok
         |  FROM docs),
         |tf AS (SELECT source, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
         |  GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM docs),
         |scored AS (SELECT t.source, t.tok, t.tf, d.df,
         |    round(CAST(t.tf AS DOUBLE) * n.n / d.df, 6) AS score
         |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY score DESC, tok) AS rk FROM scored)
         |SELECT source, tok, tf, df, score, CAST(rk AS INT) AS rk
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // score arithmetic is ×/÷ only (IEEE-exact on both engines; ln
    // would differ in final ulps), same operation order both sides
    "q_top_terms" ->
      s"""WITH toks AS (SELECT doc_id, source, unnest($toksSql) AS tok
         |  FROM documents),
         |tf AS (SELECT source, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
         |  GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT t.source, t.tok, t.tf, d.df,
         |    round(CAST(t.tf AS DOUBLE) * n.n / d.df, 6) AS score
         |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY score DESC, tok) AS rk FROM scored)
         |SELECT source, tok, tf, df, score, CAST(rk AS INT) AS rk
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // same ×/÷-only discipline as q_top_terms: the PMI log is omitted
    // (monotone), so the score doubles are bit-identical pre-round
    "q_pmi" -> {
      val sh2 = graft.functions.Portable.shinglesSql("t", 2)
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |uni AS (SELECT tok, count(*) AS c FROM
         |    (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
         |m AS (SELECT CAST(sum(CASE WHEN len(t) > 1 THEN len(t) - 1
         |    ELSE 0 END) AS BIGINT) AS m FROM toks),
         |pr AS (SELECT bigram, count(*) AS n_pair FROM
         |    (SELECT unnest($sh2) AS bigram FROM toks)
         |  GROUP BY 1 HAVING count(*) >= 5),
         |sc AS (SELECT p.bigram, p.n_pair, la.c AS n_left, rb.c AS n_right,
         |    round(CAST(p.n_pair AS DOUBLE) * n.n * n.n
         |      / (la.c * rb.c) / m.m, 6) AS score
         |  FROM pr p
         |  JOIN uni la ON la.tok = split_part(p.bigram, ' ', 1)
         |  JOIN uni rb ON rb.tok = split_part(p.bigram, ' ', 2)
         |  CROSS JOIN n CROSS JOIN m),
         |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, bigram)
         |    AS rk FROM sc)
         |SELECT CAST(rk AS INT) AS rk, bigram, n_pair, n_left, n_right,
         |  score
         |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin
    },

    "q_doc_keywords" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok
         |  FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT t.doc_id, t.tok, t.tf, d.df,
         |    round(CAST(t.tf AS DOUBLE) * n.n / d.df, 6) AS score
         |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, tok) AS rk FROM scored)
         |SELECT doc_id, CAST(rk AS INT) AS rk, tok, tf, df, score
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // token positions are 1-based here vs 0-based in Spark's
    // posexplode — coverage arithmetic is internally consistent per
    // engine, and the compared column is the rebuilt text only
    "q_strip_boilerplate" -> {
      val sh3 = graft.functions.Portable.shinglesSql("t", 3)
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, unnest($sh3) AS shingle FROM toks),
         |bp AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) >= 5),
         |tk AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t
         |  FROM toks),
         |tok AS (SELECT doc_id, pos, t[pos] AS tok FROM tk),
         |gr0 AS (SELECT doc_id, $sh3 AS g FROM toks),
         |gr AS (SELECT doc_id, unnest(generate_series(1, len(g))) AS start, g
         |  FROM gr0),
         |hits AS (SELECT r.doc_id, r.start FROM gr r
         |  JOIN bp ON r.g[r.start] = bp.shingle),
         |covered AS (SELECT DISTINCT doc_id, pos FROM (
         |  SELECT doc_id, unnest(generate_series(start, start + 2)) AS pos
         |  FROM hits)),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
         |  LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
         |  WHERE c.pos IS NULL),
         |rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos)
         |    AS text_clean
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(r.text_clean, '') AS text_clean
         |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_quality_classifier" -> perceptronOracleSql(
      buckets = 1024, epochs = 3, minStop = 2),

    "q_classifier_eval" -> marginGateEvalOracleSql(
      buckets = 1024, minStop = 2, trainPct = 80),

    "q_calibration" -> {
      val (step, clamp) = (256, 16)
      s"""WITH ${perceptronBaseCtes(buckets = 1024, minStop = 2)},
         |${perceptronEpochCtes(1, "f", "lab")},
         |${perceptronMarginCte("fm", "f", "w1")},
         |sc AS (SELECT l.doc_id, l.y, fm.margin,
         |    CAST(CASE WHEN fm.margin > 0 THEN 1 ELSE -1 END AS BIGINT)
         |      AS pred
         |  FROM lab l JOIN fm USING (doc_id)),
         |bk AS (SELECT y, pred,
         |    greatest(least(CASE WHEN margin >= 0 THEN margin // $step
         |      ELSE -((-margin) // $step) END, $clamp), -$clamp) AS bucket
         |  FROM sc)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pos_label,
         |  CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_agree,
         |  round(CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS pos_share
         |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "q_hybrid_rrf" -> {
      val cos = SimilarityQueries.cosSqlN("qv.q", "c.v",
        SimilarityQueries.Dim)
      s"""WITH $bm25ScCte,
         |bmr AS (SELECT doc_id AS id, CAST(row_number()
         |      OVER (ORDER BY score DESC, doc_id) AS INT) AS bm25_rank
         |  FROM sc
         |  QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 20),
         |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |qv AS (SELECT v AS q FROM vecs WHERE vec_id = 0),
         |kscored AS (SELECT c.vec_id AS id, $cos AS cos
         |  FROM vecs c, qv WHERE c.vec_id <> 0),
         |knn AS (SELECT id, CAST(row_number()
         |      OVER (ORDER BY cos DESC, id) AS INT) AS knn_rank
         |  FROM kscored
         |  QUALIFY row_number() OVER (ORDER BY cos DESC, id) <= 20),
         |f AS (SELECT coalesce(bmr.id, knn.id) AS id, bm25_rank, knn_rank,
         |    coalesce(1000000 // (60 + bm25_rank), 0) +
         |    coalesce(1000000 // (60 + knn_rank), 0) AS rrf_score
         |  FROM bmr FULL JOIN knn ON bmr.id = knn.id)
         |SELECT CAST(row_number() OVER w AS INT) AS rank, id,
         |  CAST(rrf_score AS BIGINT) AS rrf_score, bm25_rank, knn_rank
         |FROM f
         |WINDOW w AS (ORDER BY rrf_score DESC, id)
         |QUALIFY row_number() OVER w <= 10
         |ORDER BY rank""".stripMargin
    },

    "q_curriculum" ->
      s"""WITH ${perceptronBaseCtes(buckets = 1024, minStop = 2)},
         |${perceptronEpochCtes(1, "f", "lab")},
         |${perceptronMarginCte("fm", "f", "w1")}
         |SELECT CAST(row_number()
         |    OVER (ORDER BY margin DESC, doc_id) AS BIGINT) AS rid,
         |  doc_id, margin
         |FROM fm ORDER BY rid""".stripMargin,
  )

  /** Shared perceptron CTE pieces — the tok/lab/f/w0 base tables, the
    * generated epoch blocks (one margins/misclassified/delta/weights
    * block per epoch), and the final-margin CTE — so the standalone
    * oracle (q_quality_classifier), the held-out eval oracle
    * (q_classifier_eval), and the composed curation oracles
    * (q_curated_v2 / q_audit_v2 in [[CurationQueries]]) all unroll the
    * IDENTICAL training loop the Spark trainer runs: same w₀ = 0 empty
    * table, same ≤ 0 misclassification rule, same full-join weight
    * accumulation. All sums are over ±1 BIGINTs: order-independent on
    * both engines.
    */
  private[queries] def perceptronBaseCtes(buckets: Int,
                                          minStop: Int): String = {
    val stopList = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    val hashB = graft.functions.Portable.hash32Sql("tk")
    s"""tok AS (SELECT doc_id,
       |    list_filter($toksSql, t -> len(t) > 0) AS t FROM documents),
       |lab AS (SELECT doc_id,
       |    CAST(CASE WHEN len(list_filter(list_distinct(t),
       |      x -> x IN ($stopList))) >= $minStop THEN 1 ELSE -1 END
       |      AS BIGINT) AS y
       |  FROM tok WHERE len(t) >= 1),
       |ftok AS (SELECT doc_id, unnest(t) AS tk FROM tok WHERE len(t) >= 1),
       |f AS (SELECT DISTINCT doc_id, $hashB % $buckets AS b FROM ftok),
       |w0 AS (SELECT CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS w
       |  LIMIT 0)""".stripMargin
  }

  /** One epoch block per round over the given feature/label relations
    * (the eval oracle trains on the split-filtered pair only). */
  private[queries] def perceptronEpochCtes(epochs: Int, featRel: String,
                                           labRel: String): String =
    (1 to epochs).map { e =>
      s"""m$e AS (SELECT f.doc_id, CAST(sum(coalesce(w.w, 0)) AS BIGINT)
         |    AS margin
         |  FROM $featRel f LEFT JOIN w${e - 1} w ON f.b = w.b GROUP BY 1),
         |mis$e AS (SELECT l.doc_id, l.y FROM $labRel l
         |  JOIN m$e USING (doc_id) WHERE l.y * m$e.margin <= 0),
         |d$e AS (SELECT f.b, CAST(sum(mis$e.y) AS BIGINT) AS dw
         |  FROM $featRel f JOIN mis$e USING (doc_id) GROUP BY 1),
         |w$e AS (SELECT coalesce(pw.b, d.b) AS b,
         |    coalesce(pw.w, 0) + coalesce(d.dw, 0) AS w
         |  FROM w${e - 1} pw FULL JOIN d$e d ON pw.b = d.b)""".stripMargin
    }.mkString(",\n")

  /** Final-model margins of `featRel` docs under weight table `wRel`. */
  private[queries] def perceptronMarginCte(name: String, featRel: String,
                                           wRel: String): String =
    s"""$name AS (SELECT f.doc_id, CAST(sum(coalesce(w.w, 0)) AS BIGINT)
       |    AS margin
       |  FROM $featRel f LEFT JOIN $wRel w ON f.b = w.b GROUP BY 1)""".stripMargin

  /** DuckDB replay of [[graft.operators.Classify.perceptronQuality]]. */
  private def perceptronOracleSql(buckets: Int, epochs: Int,
                                  minStop: Int): String =
    s"""WITH ${perceptronBaseCtes(buckets, minStop)},
       |${perceptronEpochCtes(epochs, "f", "lab")},
       |${perceptronMarginCte("fm", "f", s"w$epochs")}
       |SELECT l.doc_id, l.y AS label, fm.margin,
       |  CAST(CASE WHEN fm.margin > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
       |  CAST(CASE WHEN (CASE WHEN fm.margin > 0 THEN 1 ELSE -1 END) = l.y
       |    THEN 1 ELSE 0 END AS INT) AS agrees
       |FROM lab l JOIN fm USING (doc_id)
       |ORDER BY l.doc_id""".stripMargin

  /** The gate predicate in oracle form — margin·n ≥ Σ margins in
    * HUGEINT, the exact mirror of Classify.aboveMean's decimal(38,0)
    * comparison. */
  private[queries] def aboveMeanSql(margin: String, n: String,
                                    s: String): String =
    s"CAST($margin AS HUGEINT) * $n >= CAST($s AS HUGEINT)"

  /** DuckDB replay of [[graft.operators.Classify.marginGateEval]]: one
    * epoch trained on the bucket(doc_id) < trainPct features/labels,
    * threshold = TRAIN mean margin (integer cross-multiply), held-out
    * margins scored against it, confusion per source. Counts are
    * BIGINT throughout.
    */
  private def marginGateEvalOracleSql(buckets: Int, minStop: Int,
                                      trainPct: Int): String = {
    val b =
      s"${graft.functions.Portable.hash32Sql("CAST(doc_id AS VARCHAR)")} % 100"
    s"""WITH ${perceptronBaseCtes(buckets, minStop)},
       |ftr AS (SELECT * FROM f WHERE $b < $trainPct),
       |labtr AS (SELECT * FROM lab WHERE $b < $trainPct),
       |${perceptronEpochCtes(1, "ftr", "labtr")},
       |${perceptronMarginCte("fmtr", "ftr", "w1")},
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(margin) AS BIGINT) AS s FROM fmtr),
       |fev AS (SELECT * FROM f WHERE $b >= $trainPct),
       |labev AS (SELECT * FROM lab WHERE $b >= $trainPct),
       |${perceptronMarginCte("fm", "fev", "w1")},
       |sc AS (SELECT l.doc_id, l.y,
       |    CAST(CASE WHEN ${aboveMeanSql("fm.margin", "st.n", "st.s")}
       |      THEN 1 ELSE -1 END AS BIGINT) AS pred
       |  FROM labev l JOIN fm USING (doc_id), st),
       |conf AS (SELECT d.source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN pred = 1 AND y = -1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN pred = -1 AND y = -1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tn,
       |    CAST(sum(CASE WHEN pred = -1 AND y = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fn
       |  FROM sc JOIN documents d USING (doc_id) GROUP BY 1)
       |SELECT source, n_docs, tp, fp, tn, fn, tp + tn AS correct
       |FROM conf ORDER BY source""".stripMargin
  }
}
