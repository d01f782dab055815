package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.model.Tables
import graft.operators.Curation

/** Dataset-curation queries over `documents`: deterministic hash
  * sampling, train/val/test split, cumulative-quota sequence packing,
  * and shingle-overlap decontamination. All hash decisions are
  * md5-prefix arithmetic mirrored verbatim in the DuckDB oracles, so
  * the "random" splits hash-match bit-for-bit.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 3
  private val PackBudget = 256L
  private val TokenBudget = 1000L
  private val QualityBudget = 500L

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  val queries: Map[String, Q] = Map(
    // deterministic 10% sample by doc_id hash bucket
    "q_hash_sample" -> ((s, d) =>
      Curation.hashSample(docs(s, d), "doc_id", pct = 10)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // 80/10/10 split assignment; aggregate counts per (split, source)
    "q_dataset_split" -> ((s, d) =>
      Curation.datasetSplit(docs(s, d), "doc_id")
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "source")),

    // pack docs into ~256-token packs per source, ordered by doc_id
    "q_seq_pack" -> ((s, d) =>
      Curation.packSequences(
        docs(s, d).withColumn("n_tokens",
          size(Portable.tokens(col("text"))).cast("long")),
        "doc_id", "n_tokens", PackBudget, "source")
        .select("doc_id", "source", "n_tokens", "pack_id")
        .orderBy("doc_id")),

    // pack-utilization audit: per (source, pack) doc count, token
    // mass, and integer basis-point fill vs the 256-token budget
    "q_pack_stats" -> ((s, d) =>
      Curation.packUtilization(
        Curation.packSequences(
          docs(s, d).withColumn("n_tokens",
            size(Portable.tokens(col("text"))).cast("long")),
          "doc_id", "n_tokens", PackBudget, "source"),
        "n_tokens", PackBudget, "source")
        .orderBy("source", "pack_id")),

    // best-first token budget: each source admits its highest-margin
    // docs (epoch-1 model score) until 500 tokens — the "spend the
    // budget on the best data" twin of q_token_budget's fair-hash
    // admission
    "q_quality_budget" -> ((s, d) =>
      Curation.qualityBudgetCap(
        docs(s, d).withColumn("n_tokens",
          size(Portable.tokens(col("text"))).cast("long")),
        "doc_id", "text", "source", "n_tokens", QualityBudget)
        .select("doc_id", "source", "n_tokens", "margin", "cum_tokens")
        .orderBy("doc_id")),

    // 1000-token budget per source, hash-ordered admission — the
    // "N tokens per domain" mixture contract
    "q_token_budget" -> ((s, d) =>
      Curation.tokenBudgetCap(
        docs(s, d).withColumn("n_tokens",
          size(Portable.tokens(col("text"))).cast("long")),
        "doc_id", "source", "n_tokens", TokenBudget)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .orderBy("doc_id")),

    // at most 5 docs per source, best-first by length — the doc-COUNT
    // quota beside q_token_budget's token-mass quota
    "q_domain_cap" -> ((s, d) =>
      Curation.capPerGroup(docs(s, d), "source", "doc_id", "n_chars", 5)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // decontamination: training docs sharing a 3-shingle with the
    // benchmark slice (every 20th doc) are dropped
    "q_decontam" -> ((s, d) => {
      val all = docs(s, d)
      val bench = all.filter(col("doc_id") % 20 === 0)
      val train = all.filter(col("doc_id") % 20 =!= 0)
      Curation.decontaminate(train, bench, "doc_id", "text", K)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // contamination severity: per contaminated doc, overlap counts +
    // the benchmark item that leaked (max shared shingles, min-id tie)
    "q_contam_report" -> ((s, d) => {
      val all = docs(s, d)
      Curation.contaminationReport(
        all.filter(col("doc_id") % 20 =!= 0),
        all.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", K)
        .orderBy("doc_id")
    }),

    // bloom-pruned decontamination: same exact result (and oracle SQL)
    // as q_decontam — the broadcast sketch only gates which docs reach
    // the exact semi-join
    "q_bloom_decontam" -> ((s, d) => {
      val all = docs(s, d)
      val bench = all.filter(col("doc_id") % 20 === 0)
      val train = all.filter(col("doc_id") % 20 =!= 0)
      Curation.decontaminateBloom(train, bench, "doc_id", "text", K)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // domain-mixture resample: 2.5× src0, 0.4× src1, drop src2,
    // everything else 1× — deterministic hash arithmetic, zero shuffle
    "q_mixture_sample" -> ((s, d) =>
      Curation.mixtureSample(docs(s, d), "doc_id", "source", MixRates)
        .select(col("doc_id"), col("source"),
          col("copy_idx").cast("long").as("copy_idx"))
        .orderBy("doc_id", "copy_idx")),

    // deterministic interleaved training order: round-robin across
    // sources, hash-shuffled within each
    "q_interleave" -> ((s, d) =>
      Curation.interleaveBySource(
        docs(s, d).select("doc_id", "source"), "doc_id", "source")
        .orderBy("rid")),

    // token-budgeted domain downsampling: every source hash-sampled to
    // ≈7000 chars of mass; rates are data-dependent aggregates, not
    // literals
    "q_budgeted_sample" -> ((s, d) =>
      Curation.budgetedSample(docs(s, d), "doc_id", "source", "n_chars",
        budgetTokens = 7000L)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // exactly 5 docs per source, hash-ordered — deterministic stratum
    "q_stratified_sample" -> ((s, d) =>
      Curation.stratifiedSample(docs(s, d), "source", "doc_id", 5)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // 5 docs per source, selection odds proportional-ish to length —
    // deterministic integer priority, no RNG
    "q_weighted_sample" -> ((s, d) =>
      Curation.weightedSample(
        docs(s, d).withColumn("n_tokens",
          size(Portable.tokens(col("text"))).cast("long")),
        "doc_id", "n_tokens", "source", 5)
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")),

    // 32-token budget truncation with loss flag — row-local map
    "q_truncate" -> ((s, d) =>
      Curation.truncateTokens(docs(s, d), "text", 32)
        .select("doc_id", "text_trunc", "was_truncated")
        .orderBy("doc_id")),

    // the composed curation pipeline: quality gate → transitive
    // dedup → split → pack, one lazy plan, one composed oracle
    "q_corpus_pipeline" -> ((s, d) =>
      Curation.curateCorpus(docs(s, d), "doc_id", "text", "source")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("split"), col("pack_id"))
        .orderBy("doc_id")),

    // the audit twin: every input doc with its fate — 'quality' /
    // 'near_dup' (+ the keeper it lost to) / 'kept' (+ split, pack)
    "q_curation_audit" -> ((s, d) =>
      Curation.curationAudit(docs(s, d), "doc_id", "text", "source")
        .orderBy("doc_id")),

    // the CCNet-ordered twin: MODEL-quality gate (corpus-trained
    // perceptron, same constants as q_quality_classifier) in front of
    // the heuristic gate → dedup → split → pack
    "q_curated_v2" -> ((s, d) =>
      Curation.curateCorpusModel(docs(s, d), "doc_id", "text", "source")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("split"), col("pack_id"))
        .orderBy("doc_id")),

    // its audit twin: every input doc's fate, now including
    // 'model_filtered' for docs the perceptron refused
    "q_audit_v2" -> ((s, d) =>
      Curation.curationAuditModel(docs(s, d), "doc_id", "text", "source")
        .orderBy("doc_id")),

    // 24-token chunks with 8-token overlap — row-local explode, the
    // pre-embedding fan-out
    "q_chunk" -> ((s, d) =>
      Curation.chunkTokens(docs(s, d), "doc_id", "text",
        chunkSize = 24, overlap = 8)
        .orderBy("doc_id", "chunk_idx")),

    // per-source corpus profile with exact interpolated percentiles
    "q_corpus_stats" -> ((s, d) =>
      graft.operators.TextOps.corpusProfile(docs(s, d), "text", "source")
        .orderBy("source")),

    // Hive-partitioned corpus layout: write split=<v>/ directories,
    // read back ONLY the train partition — the 100 TB access pattern
    // (a train-set scan must touch train files, never the test dirs;
    // PlanAuditSpec asserts the PartitionFilters prune)
    "q_partitioned_prune" -> ((s, d) => {
      val out = Scratch.fresh(s"part_${Scratch.tag(d)}")
      Curation.datasetSplit(docs(s, d), "doc_id")
        .write.mode("overwrite").partitionBy("split").parquet(out)
      s.read.parquet(out)
        .filter(col("split") === "train")
        .select("doc_id", "lang", "source", "split")
        .orderBy("doc_id")
    }))

  private val MixRates =
    Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0)

  // ---- oracle SQL, same constants ----

  private def bucketSql(e: String): String =
    s"${Portable.hash32Sql(s"CAST($e AS VARCHAR)")} % 100"

  private val shingleSqlOf =
    s"""toks AS (SELECT doc_id, ${Portable.tokensSql("text")} AS t
       |  FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |    unnest(${Portable.shinglesSql("t", K)}) AS s
       |  FROM toks)""".stripMargin

  /** Gopher repetition gate CTEs (rs*-prefixed so the dedup CTE names
    * stay free) for one shingle size.
    */
  private def repStats(n: Int) =
    s"""rg$n AS (SELECT doc_id,
       |  unnest(${Portable.shinglesSql("rt", n)}) AS g FROM rtoks),
       |rc$n AS (SELECT doc_id, g, count(*) AS c FROM rg$n GROUP BY 1, 2),
       |rs$n AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot,
       |  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
       |  FROM rc$n GROUP BY 1)""".stripMargin

  /** The full curation-pipeline CTE body (quality gate → near-dup CC →
    * split → pack) over an arbitrary documents-shaped relation, shared
    * by q_corpus_pipeline / q_curation_audit (over `documents`) and the
    * model-gated twins q_curated_v2 / q_audit_v2 (over the perceptron
    * survivors `mdocs`) so the oracles can never drift apart. Ends at
    * `packed` — callers append the final SELECT (prefix with RECURSIVE
    * for the `reach` CTE).
    */
  private def pipelineCtesFrom(rel: String) =
    s"""rtoks AS (SELECT doc_id,
       |    ${Portable.tokensSql("text")} AS rt FROM $rel),
       |${repStats(2)},
       |${repStats(3)},
       |${repStats(5)},
       |qual AS (SELECT d.doc_id FROM $rel d
       |  LEFT JOIN rs2 ON rs2.doc_id = d.doc_id
       |  LEFT JOIN rs3 ON rs3.doc_id = d.doc_id
       |  LEFT JOIN rs5 ON rs5.doc_id = d.doc_id
       |  WHERE coalesce(round(CAST(rs2.mx AS DOUBLE) / rs2.tot, 6), 0.0) <= 0.20
       |    AND coalesce(round(CAST(rs3.mx AS DOUBLE) / rs3.tot, 6), 0.0) <= 0.18
       |    AND coalesce(round(CAST(rs5.dup AS DOUBLE) / rs5.tot, 6), 0.0) <= 0.15),
       |base AS (SELECT d.doc_id, d.text, d.source,
       |    CAST(len(rt.rt) AS BIGINT) AS n_tokens
       |  FROM $rel d
       |  JOIN rtoks rt ON rt.doc_id = d.doc_id
       |  JOIN qual q ON q.doc_id = d.doc_id
       |  WHERE len(rt.rt) >= 20),
       |${DedupQueries.sigCteFrom("base")},
       |${DedupQueries.bandsCteText},
       |${DedupQueries.pairsCtes(0.5)},
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, comp) AS (
       |  SELECT doc_id, doc_id FROM base
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON r.id = e.dst),
       |comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
       |kept AS (SELECT b.* FROM base b
       |  JOIN comps c ON c.id = b.doc_id AND c.comp = b.doc_id),
       |sp AS (SELECT doc_id, source, n_tokens,
       |    CASE WHEN ${bucketSql("doc_id")} < 80 THEN 'train'
       |         WHEN ${bucketSql("doc_id")} < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM kept),
       |packed AS (SELECT doc_id, source, n_tokens, split,
       |  CAST(floor((sum(n_tokens) OVER (PARTITION BY split, source
       |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)
       |    / 256) AS BIGINT) AS pack_id
       |  FROM sp)""".stripMargin

  private lazy val pipelineCtes = pipelineCtesFrom("documents")

  /** Model-gate CTE chain: the epoch-1 training unroll from
    * [[TextQueries]] (same feature/label constants as
    * q_quality_classifier), the kept-id set — margin at least the
    * corpus MEAN margin, the integer-exact HUGEINT cross-multiply
    * mirroring Classify.marginGate — and `mdocs`, the documents
    * relation the CCNet-ordered pipeline body runs over.
    */
  private def modelGateCtes(buckets: Int, minStop: Int): String =
    s"""${TextQueries.perceptronBaseCtes(buckets, minStop)},
       |${TextQueries.perceptronEpochCtes(1, "f", "lab")},
       |${TextQueries.perceptronMarginCte("fm", "f", "w1")},
       |mst AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(margin) AS BIGINT) AS s FROM fm),
       |mkeep AS (SELECT doc_id FROM fm, mst
       |  WHERE ${TextQueries.aboveMeanSql("fm.margin", "mst.n", "mst.s")}),
       |mdocs AS (SELECT d.* FROM documents d JOIN mkeep USING (doc_id))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_hash_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${bucketSql("doc_id")} < 10
         |ORDER BY doc_id""".stripMargin,

    "q_dataset_split" ->
      s"""SELECT CASE WHEN ${bucketSql("doc_id")} < 80 THEN 'train'
         |            WHEN ${bucketSql("doc_id")} < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       source, count(*) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY split, source""".stripMargin,

    "q_seq_pack" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len(${Portable.tokensSql("text")}) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, source, n_tokens,
         |  CAST(floor((sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)
         |    / $PackBudget) AS BIGINT) AS pack_id
         |FROM t ORDER BY doc_id""".stripMargin,

    "q_quality_budget" ->
      s"""WITH ${TextQueries.perceptronBaseCtes(1024, 2)},
         |${TextQueries.perceptronEpochCtes(1, "f", "lab")},
         |${TextQueries.perceptronMarginCte("fm", "f", "w1")},
         |t AS (SELECT d.doc_id, d.source,
         |    CAST(len(${Portable.tokensSql("d.text")}) AS BIGINT) AS n_tokens,
         |    fm.margin
         |  FROM documents d JOIN fm ON fm.doc_id = d.doc_id),
         |c AS (SELECT doc_id, source, n_tokens, margin,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY margin DESC, doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_tokens
         |  FROM t)
         |SELECT doc_id, source, n_tokens, margin, cum_tokens FROM c
         |WHERE cum_tokens <= $QualityBudget
         |ORDER BY doc_id""".stripMargin,

    "q_pack_stats" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len(${Portable.tokensSql("text")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |p AS (SELECT doc_id, source, n_tokens,
         |  CAST(floor((sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)
         |    / $PackBudget) AS BIGINT) AS pack_id
         |  FROM t)
         |SELECT source, pack_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  CAST(sum(n_tokens) * 10000 // $PackBudget AS BIGINT) AS util_bp
         |FROM p GROUP BY 1, 2
         |ORDER BY source, pack_id""".stripMargin,

    "q_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len(${Portable.tokensSql("text")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")},
         |               doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS cum_tokens
         |  FROM t)
         |SELECT doc_id, source, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= $TokenBudget
         |ORDER BY doc_id""".stripMargin,

    "q_domain_cap" ->
      s"""SELECT doc_id, source, n_chars FROM documents
         |QUALIFY row_number() OVER (
         |  PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 5
         |ORDER BY doc_id""".stripMargin,

    "q_interleave" ->
      s"""WITH g AS (SELECT doc_id, source, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")},
         |             doc_id) AS grank
         |  FROM documents)
         |SELECT doc_id, source,
         |  row_number() OVER (ORDER BY grank ASC NULLS FIRST,
         |    source ASC NULLS FIRST, doc_id ASC NULLS FIRST) AS rid
         |FROM g ORDER BY rid""".stripMargin,

    "q_budgeted_sample" ->
      s"""WITH t AS (SELECT source, sum(n_chars) AS total
         |  FROM documents GROUP BY 1),
         |r AS (SELECT source, least(1.0, 7000.0 / total) AS rate FROM t)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d JOIN r USING (source)
         |WHERE ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")} % 100000000
         |      < GREATEST(1, CAST(round(rate * 100000000) AS BIGINT))
         |ORDER BY d.doc_id""".stripMargin,

    "q_decontam" ->
      s"""WITH $shingleSqlOf,
         |bench_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
         |contaminated AS (SELECT DISTINCT doc_id FROM sh
         |  WHERE doc_id % 20 <> 0 AND s IN (SELECT s FROM bench_sh))
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id % 20 <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |ORDER BY doc_id""".stripMargin,

    "q_contam_report" ->
      s"""WITH $shingleSqlOf,
         |tsh AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
         |bsh AS (SELECT doc_id AS bench_id, s FROM sh
         |  WHERE doc_id % 20 = 0),
         |tot AS (SELECT doc_id, count(*) AS n_shingles FROM tsh
         |  GROUP BY 1),
         |hits AS (SELECT t.doc_id, b.bench_id, t.s
         |  FROM tsh t JOIN bsh b USING (s)),
         |perdoc AS (SELECT doc_id, count(DISTINCT s) AS n_contaminated
         |  FROM hits GROUP BY 1),
         |blame AS (SELECT doc_id, bench_id, count(*) AS n_shared,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY count(*) DESC, bench_id) AS rn
         |  FROM hits GROUP BY doc_id, bench_id)
         |SELECT p.doc_id, tot.n_shingles, p.n_contaminated,
         |  round(CAST(p.n_contaminated AS DOUBLE) / tot.n_shingles, 6)
         |    AS contam_share,
         |  b.bench_id AS blame_bench_id, b.n_shared
         |FROM perdoc p
         |JOIN tot USING (doc_id)
         |JOIN (SELECT * FROM blame WHERE rn = 1) b USING (doc_id)
         |ORDER BY p.doc_id""".stripMargin,

    // the bloom gate is pure pruning — the exact-decontam SQL IS the
    // oracle for the bloom-pruned plan (no false negatives, false
    // positives verified away)
    "q_bloom_decontam" ->
      s"""WITH $shingleSqlOf,
         |bench_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
         |contaminated AS (SELECT DISTINCT doc_id FROM sh
         |  WHERE doc_id % 20 <> 0 AND s IN (SELECT s FROM bench_sh))
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id % 20 <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |ORDER BY doc_id""".stripMargin,

    "q_mixture_sample" -> {
      val rateCase = MixRates.foldLeft("1.0") { case (acc, (g, r)) =>
        s"CASE WHEN source = '$g' THEN $r ELSE $acc END"
      }
      s"""WITH r AS (SELECT doc_id, source, $rateCase AS rate,
         |    ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")} % 10000
         |      AS b FROM documents),
         |c AS (SELECT doc_id, source,
         |    CAST(floor(rate) AS INT)
         |      + CASE WHEN b < CAST(round((rate - floor(rate)) * 10000)
         |                       AS INT) THEN 1 ELSE 0 END AS n_copies
         |  FROM r)
         |SELECT doc_id, source,
         |  CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
         |FROM c WHERE n_copies >= 1
         |ORDER BY doc_id, copy_idx""".stripMargin
    },

    "q_stratified_sample" ->
      s"""WITH r AS (SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")},
         |               doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, source FROM r WHERE rn <= 5
         |ORDER BY doc_id""".stripMargin,

    "q_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len(${Portable.tokensSql("text")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT doc_id, source, n_tokens,
         |    row_number() OVER (PARTITION BY source ORDER BY
         |      (${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")} * 1000000)
         |        // greatest(n_tokens, 1),
         |      doc_id) AS rn
         |  FROM t)
         |SELECT doc_id, source, n_tokens FROM r WHERE rn <= 5
         |ORDER BY doc_id""".stripMargin,

    "q_truncate" ->
      s"""WITH t AS (SELECT doc_id, ${Portable.tokensSql("text")} AS toks
         |  FROM documents)
         |SELECT doc_id,
         |  array_to_string(toks[1:32], ' ') AS text_trunc,
         |  len(toks) > 32 AS was_truncated
         |FROM t ORDER BY doc_id""".stripMargin,

    "q_corpus_pipeline" ->
      s"""WITH RECURSIVE $pipelineCtes
         |SELECT doc_id, source, n_tokens, split, pack_id
         |FROM packed ORDER BY doc_id""".stripMargin,

    // the audit twin: same CTE body, verdicts instead of filters
    "q_curation_audit" ->
      s"""WITH RECURSIVE $pipelineCtes
         |SELECT d.doc_id, d.source, CAST(len(rt.rt) AS BIGINT) AS n_tokens,
         |  CASE WHEN b.doc_id IS NULL THEN 'quality'
         |       WHEN c.comp <> d.doc_id THEN 'near_dup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN b.doc_id IS NOT NULL AND c.comp <> d.doc_id
         |       THEN c.comp END AS blame_id,
         |  p.split, p.pack_id
         |FROM documents d
         |JOIN rtoks rt ON rt.doc_id = d.doc_id
         |LEFT JOIN base b ON b.doc_id = d.doc_id
         |LEFT JOIN comps c ON c.id = d.doc_id
         |LEFT JOIN packed p ON p.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_curated_v2" ->
      s"""WITH RECURSIVE ${modelGateCtes(1024, 2)},
         |${pipelineCtesFrom("mdocs")}
         |SELECT doc_id, source, n_tokens, split, pack_id
         |FROM packed ORDER BY doc_id""".stripMargin,

    // audit twin: the pipeline verdicts over the gate survivors, plus
    // a model_filtered row for every doc outside mkeep
    "q_audit_v2" ->
      s"""WITH RECURSIVE ${modelGateCtes(1024, 2)},
         |${pipelineCtesFrom("mdocs")}
         |SELECT d.doc_id, d.source, CAST(len(rt.rt) AS BIGINT) AS n_tokens,
         |  CASE WHEN b.doc_id IS NULL THEN 'quality'
         |       WHEN c.comp <> d.doc_id THEN 'near_dup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN b.doc_id IS NOT NULL AND c.comp <> d.doc_id
         |       THEN c.comp END AS blame_id,
         |  p.split, p.pack_id
         |FROM mdocs d
         |JOIN rtoks rt ON rt.doc_id = d.doc_id
         |LEFT JOIN base b ON b.doc_id = d.doc_id
         |LEFT JOIN comps c ON c.id = d.doc_id
         |LEFT JOIN packed p ON p.doc_id = d.doc_id
         |UNION ALL
         |SELECT d.doc_id, d.source,
         |  CAST(len(${Portable.tokensSql("d.text")}) AS BIGINT) AS n_tokens,
         |  'model_filtered' AS fate,
         |  CAST(NULL AS BIGINT) AS blame_id,
         |  CAST(NULL AS VARCHAR) AS split,
         |  CAST(NULL AS BIGINT) AS pack_id
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM mkeep)
         |ORDER BY doc_id""".stripMargin,

    "q_chunk" ->
      s"""WITH t AS (SELECT doc_id, ${Portable.tokensSql("text")} AS toks
         |  FROM documents),
         |st AS (SELECT doc_id, toks,
         |    unnest(generate_series(1, greatest(len(toks), 1), 16)) AS s
         |  FROM t)
         |SELECT doc_id,
         |  CAST((s - 1) / 16 AS BIGINT) AS chunk_idx,
         |  array_to_string(toks[s:s+23], ' ') AS chunk_text
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_corpus_stats" ->
      s"""WITH t AS (SELECT source, lang,
         |    CAST(len(${Portable.tokensSql("text")}) AS BIGINT) AS nt
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS total_tokens,
         |  round(avg(nt), 6) AS avg_tokens,
         |  round(quantile_cont(nt, 0.5), 6) AS p50_tokens,
         |  round(quantile_cont(nt, 0.9), 6) AS p90_tokens,
         |  count(DISTINCT lang) AS n_langs
         |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "q_partitioned_prune" ->
      s"""SELECT doc_id, lang, source, 'train' AS split FROM documents
         |WHERE ${bucketSql("doc_id")} < 80
         |ORDER BY doc_id""".stripMargin)
}
