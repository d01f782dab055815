package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Dataset-curation operators for training-data pipelines: sampling,
  * split assignment, sequence packing, decontamination. None exist in
  * the reference; all are first-class needs at 100 TB corpus scale.
  *
  * Every random-looking decision here is DETERMINISTIC hash
  * arithmetic (md5-prefix buckets, Portable.hash32): seeded RNG
  * sampling is irreproducible across engines/partitionings, while a
  * content-keyed hash gives the same holdout on any engine, any day —
  * which is what makes train/test splits auditable. No shuffle is
  * needed for sampling/splitting at all (pure row-local projection);
  * packing is one window per source; decontamination is a shingle
  * semi-join (shuffle on shingle, never doc×doc).
  */
object Curation {

  /** Stable bucket in [0, buckets) from the md5-prefix hash of a
    * column's string form — engine-portable (DuckDB mirrors it).
    */
  def hashBucket(c: Column, buckets: Int = 100): Column =
    Portable.hash32(c.cast("string")) % buckets

  /** Deterministic sample: keeps rows whose key hashes into the first
    * `pct` of 100 buckets. Sampling a fact table costs a scan, zero
    * shuffles.
    */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < pct)

  /** Train/val/test assignment by hash bucket: [0,train) → "train",
    * [train, train+valPct) → "val", rest → "test". Row-local.
    */
  def datasetSplit(df: DataFrame, keyCol: String, trainPct: Int = 80,
                   valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(keyCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** LEAKAGE-SAFE train/val/test split: assignment is by near-dup
    * CLUSTER, not by document. Every member of a component receives
    * the bucket of the component label, so near-duplicates can never
    * straddle train and test — the eval-contamination channel a
    * per-doc hash split ([[datasetSplit]]) leaves open (a duplicated
    * document has ~2·p·(1−p) probability of landing on both sides of
    * the cut, and at web-corpus dup rates that is millions of leaked
    * eval documents).
    *
    * `clusters` is (idCol, component) — [[Dedup.connectedComponents]]
    * output, or any other grouping worth isolating (URL/site groups,
    * embedding clusters). Docs without a cluster row split on their
    * own id (singleton component). Cost: ONE join against the cluster
    * map (broadcast when small, shuffle-on-id otherwise — both sides
    * already keyed on idCol); the bucketing itself is row-local.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val comp = clusters.select(col(idCol), col("component"))
    val b = hashBucket(coalesce(col("component"), col(idCol)))
    df.join(comp, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Cumulative-quota sequence packing: within each `groupCol`
    * partition ordered by `idCol`, documents are assigned to packs of
    * ~`budget` tokens by exclusive prefix sum — pack =
    * floor(tokens_before / budget). This is the deterministic
    * streaming-packing policy (a doc overflowing the quota starts
    * inside the current pack and pushes the next doc out), NOT optimal
    * bin packing — which is NP-hard and order-unstable. One window
    * per group; shuffle on groupCol only.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
                    budget: Long, groupCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCountCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCountCol)) / budget).cast("long"))
      .drop("__cum")
  }

  /** Pack-utilization report — the ops audit of [[packSequences]]:
    * per (group, pack) the doc count, token mass, and utilization in
    * integer basis points of the budget. The streaming-packing policy
    * deliberately lets the last doc overflow its pack, so utilization
    * above 10000 bp marks the overflow doc's pack and the TAIL pack of
    * each group runs light; at 100 TB this report is how a data
    * engineer sees whether the budget matches the doc-length
    * distribution (chronic overflow → raise budget or pre-chunk).
    * One groupBy over the packed frame; integer arithmetic throughout.
    */
  def packUtilization(packed: DataFrame, tokenCountCol: String,
                      budget: Long, groupCol: String): DataFrame =
    packed.groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCountCol)).as("pack_tokens"))
      // `div`, not `/`: Spark's / widens integrals to double; the
      // truncating integer form matches DuckDB's // exactly
      .withColumn("util_bp", expr(s"pack_tokens * 10000 div $budget"))

  /** Per-group token-budget cap: keep documents, in deterministic
    * hash order (fair — uncorrelated with id/recency/length), until
    * the group's running token total reaches `budget`; the doc that
    * would cross the line is cut with it. This is the "N tokens per
    * source" sampling contract of a mixture spec, as one window per
    * group — shuffle on groupCol only, no global sort, and the
    * emitted `cum_tokens` makes the cut auditable.
    */
  def tokenBudgetCap(df: DataFrame, keyCol: String, groupCol: String,
                     tokenCountCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(Portable.hash32(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokenCountCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** QUALITY-ranked token budget — [[tokenBudgetCap]] with the
    * admission order flipped from fair-hash to BEST-FIRST by the model
    * score: docs join their epoch-1 discriminant margins
    * ([[Classify.perceptronQuality]], the stable ranker behind
    * [[Classify.marginGate]]) and each group admits highest-margin
    * docs until the token budget is spent (the overflow doc is cut
    * with it, same contract as tokenBudgetCap). This is the "spend the
    * token budget on the best data" move a CCNet-style pipeline makes
    * once it trusts the scorer — fair sampling answers "what does the
    * corpus look like", this answers "what should training pay for".
    * Unscorable docs (no tokens) have no margin and are never
    * admitted. One margins chain + one window per group; ties break by
    * id so the cut is total-order deterministic.
    */
  def qualityBudgetCap(df: DataFrame, idCol: String, textCol: String,
                       groupCol: String, tokenCountCol: String,
                       budget: Long, buckets: Int = 1024,
                       minStop: Int = 2): DataFrame = {
    val margins = Classify.perceptronQuality(df, idCol, textCol, buckets,
      epochs = 1, minStop = minStop)
      .select(col(idCol), col("margin"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("margin").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(margins, Seq(idCol))
      .withColumn("cum_tokens", sum(col(tokenCountCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Per-group admission CAP — "at most n docs per domain", the other
    * half of a mixture recipe's quota (tokenBudgetCap bounds token
    * mass; this bounds document COUNT, the guard against one domain
    * flooding the mix regardless of doc length). Keeps the n best rows
    * per group by (`orderCol` DESC, `keyCol` ASC) — quality-ranked
    * admission with a total-order tie-break, so the selection is
    * reproducible on any partitioning. Window+filter form: the
    * GroupedTopK rewrite executes it as a bounded heap (groups×n
    * state), never a per-group sort.
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  orderCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Decontamination: drop (or flag) training docs sharing at least
    * one k-word shingle with the benchmark set. The comparison is a
    * semi-join on the shingle key — shuffle volume is the shingle
    * tables, never |train|×|bench|.
    */
  def contaminatedIds(train: DataFrame, bench: DataFrame, idCol: String,
                      textCol: String, k: Int = 3): DataFrame = {
    // dedup=false on both sides: the semi-join + trailing distincts
    // already give set semantics, so pre-distincting the (id, shingle)
    // pairs would only add a full shuffle of the raw shingle strings
    val t = Dedup.docShingles(train, idCol, textCol, k, dedup = false)
    val b = Dedup.docShingles(bench, idCol, textCol, k, dedup = false)
      .select(col("shingle")).distinct()
    t.join(b, Seq("shingle"), "left_semi").select(col(idCol)).distinct()
  }

  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, k: Int = 3): DataFrame =
    train.join(contaminatedIds(train, bench, idCol, textCol, k),
      Seq(idCol), "left_anti")

  /** Contamination SEVERITY report — [[contaminatedIds]] tells you
    * which docs to drop; this tells you how bad each one is and which
    * benchmark item leaked: per contaminated train doc, its distinct
    * shingle count, how many of those appear anywhere in the
    * benchmark, the contamination share, and the single benchmark doc
    * sharing the most shingles (ties to the lowest id) with its
    * overlap count — the evidence row a decontam decision is reviewed
    * against.
    *
    * Scale shape: the shingle semi-join becomes an inner join keyed
    * on the shingle (bench side is benchmark-sized — broadcast tier);
    * per-doc and per-(doc, bench) counts are partial-aggregable; the
    * blame pick is a row_number the GroupedTopK heap rewrite executes
    * with rn = 1.
    */
  def contaminationReport(train: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 3): DataFrame = {
    val t = Dedup.docShingles(train, idCol, textCol, k, dedup = true)
    val bsh = Dedup.docShingles(bench, idCol, textCol, k, dedup = true)
      .select(col(idCol).as("bench_id"), col("shingle"))
    val tot = t.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val hits = t.join(bsh, "shingle")
    val perDoc = hits.groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_contaminated"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("n_shared").desc, col("bench_id").asc)
    val blame = hits.groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("bench_id").as("blame_bench_id"),
        col("n_shared"))
    perDoc.join(tot, idCol).join(blame, idCol)
      .select(col(idCol), col("n_shingles"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6)
          .as("contam_share"),
        col("blame_bench_id"), col("n_shared"))
  }

  /** Bloom-pruned decontamination — same EXACT result as
    * [[decontaminate]], different scaling shape. The plain semi-join
    * shuffles every train shingle; at 100 TB that is the corpus token
    * stream. Here the bench shingle set compiles into a broadcast
    * bloom sketch ([[graft.functions.Bloom]], ~10 bits/shingle at
    * 1% fp) and a ROW-LOCAL `exists` over each train doc's shingles
    * gates the expensive path: docs with no bloom hit — at a 1% fp
    * rate, almost all of a clean corpus — are provably uncontaminated
    * (blooms have no false negatives) and never enter a shuffle at
    * all. Only the surviving candidates run the exact shingle
    * semi-join, which de-false-positives the result, so output ==
    * [[decontaminate]] bit-for-bit and the DuckDB oracle is shared.
    *
    * The filter is SIZED FROM THE DATA by default
    * ([[graft.functions.Bloom.buildSized]]: next-pow-2 of 10
    * bits/shingle, 7 hashes — ~1% fp): a fixed mBits against an
    * unknown benchmark-set size silently degenerates to
    * pass-everything when the set outgrows it (results stay exact,
    * pruning evaporates). Pass explicit mBits/numHashes > 0 only when
    * you've sized them yourself.
    */
  def decontaminateBloom(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, k: Int = 3,
                         mBits: Int = 0,
                         numHashes: Int = 0): DataFrame = {
    import graft.functions.Bloom
    require((mBits > 0) == (numHashes > 0),
      "size the bloom fully (mBits AND numHashes) or not at all — a " +
        "half-specified override would silently fall back to auto-sizing")
    // localCheckpoint: the sized path reads this plan twice (count to
    // size, then the bit-position build) — uncached, the bench
    // tokenize+shingle+distinct shuffle would run twice per call
    val benchShingles = Dedup
      .docShingles(bench, idCol, textCol, k, dedup = false)
      .select(col("shingle")).distinct()
      .localCheckpoint()
    val (bits, m, nh) =
      if (mBits > 0)
        (Bloom.build(benchShingles, "shingle", mBits, numHashes), mBits,
          numHashes)
      else Bloom.buildSized(benchShingles, "shingle")
    // fused native probe straight off the text column: the HOF form
    // re-evaluates the inline split() per shingle (the repo's
    // documented O(tokens²) trap) and every HOF layer is interpreted
    val candidates = train.filter(
      graft.expressions.BloomExpressions.bloomShingleContain(
        col(textCol), k, bits, m, nh))
    train.join(contaminatedIds(candidates, bench, idCol, textCol, k),
      Seq(idCol), "left_anti")
  }

  /** Stratified sample: exactly `n` rows per group (fewer if the group
    * is smaller), chosen deterministically by hash order — the same
    * rows on any engine, any partitioning, any day. One window per
    * group (shuffle on groupCol); ties in the hash order break by the
    * key itself, so the selection is total-ordered.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, keyCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Portable.hash32(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic WEIGHTED sample: n rows per group, selection biased
    * toward heavier rows. Policy (documented, engine-portable): keep
    * the n smallest `hash32(key)·10⁶ div weight` — all integer
    * arithmetic, so the draw is reproducible anywhere, and a row's
    * selection odds scale with its weight (double the weight ⇒ half
    * the expected priority). This is a deterministic *policy*, not
    * exact Efraimidis–Spirakis sampling (whose `u^(1/w)` keys need
    * float pow/ln, which never hash-match across engines). One window
    * per group, executed by the GroupedTopK heap — no per-group sort.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     groupCol: String, n: Int): DataFrame = {
    // `div` (integral division) has no Column-API form and a double
    // `/`+floor can round across the quotient boundary at this
    // magnitude — stage the operands and use the SQL operator
    val staged = df
      .withColumn("__hw",
        Portable.hash32(col(keyCol).cast("string")) * lit(1000000L))
      .withColumn("__wt", greatest(col(weightCol).cast("long"), lit(1L)))
      .withColumn("__pri", expr("__hw div __wt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__pri").asc, col(keyCol).asc)
    staged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn", "__hw", "__wt", "__pri")
  }

  /** Token-budget truncation: keep the first `maxTokens` whitespace
    * tokens, with a flag marking docs that lost content. Row-local
    * projection — no shuffle, runs as a map over the corpus scan.
    */
  def truncateTokens(df: DataFrame, textCol: String, maxTokens: Int)
      : DataFrame = {
    val t = Portable.tokens(col(textCol))
    df.withColumn("text_trunc",
      array_join(slice(t, 1, maxTokens), " "))
      .withColumn("was_truncated", size(t) > maxTokens)
  }

  /** End-to-end corpus curation — the composed pipeline a
    * training-data run executes, as one lazy plan:
    *
    *   1. quality gate: Gopher repetition thresholds
    *      ([[TextOps.repetitionStats]]) AND a minimum token count;
    *   2. dedup: transitive-closure MinHash clustering, one
    *      representative per cluster ([[Dedup.dedupCorpusTransitive]]);
    *   3. split: deterministic hash buckets ([[datasetSplit]]);
    *   4. packing: cumulative token quota per (split, source)
    *      ([[packSequences]]).
    *
    * Stage order matters and is load-bearing: filtering BEFORE dedup
    * shrinks the pair graph; splitting AFTER dedup keeps near-dups
    * from straddling train/test (the leakage a split-then-dedup order
    * permits); packing last, within each split×source stratum.
    * Everything before the dedup self-join is row-local.
    *
    * Snapshot semantics: the quality/dedup subtrees are memoized per
    * (session, input plan, params) via [[graft.Memo]], so a SECOND
    * call in the same session over the same logical input reuses the
    * materialized stages — if the underlying files were overwritten
    * in between, the memoized (pre-overwrite) decisions are returned;
    * call [[graft.Memo.clear]] to force a re-read of mutated inputs.
    */
  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, minTokens: Int = 20,
                   dedupThreshold: Double = 0.5, trainPct: Int = 80,
                   valPct: Int = 10, packBudget: Long = 256L): DataFrame = {
    val (_, base) = qualityBase(docs, idCol, textCol, minTokens)
    val kept = Dedup.dedupCorpusTransitive(base, idCol, textCol,
      k = 3, threshold = dedupThreshold)
    val split = datasetSplit(kept, idCol, trainPct, valPct)
      // composite pack stratum; '|' collides with neither split names
      // nor source ids
      .withColumn("__stratum",
        concat_ws("|", col("split"), col(sourceCol)))
    packSequences(split, idCol, "n_tokens", packBudget, "__stratum")
      .drop("__stratum")
  }

  /** Curation AUDIT trail — [[curateCorpus]] with the filters turned
    * into verdicts: every input doc comes back with its FATE instead
    * of silently disappearing. The production "why did my document
    * vanish" lineage report; at 100 TB, curation decisions must be
    * explainable per doc or debugging a feed regression means
    * re-running the pipeline under a microscope.
    *
    *   - `fate = 'quality'`  — failed the Gopher repetition gate or
    *     the minimum token count (blame/split/pack null);
    *   - `fate = 'near_dup'` — survived quality but lost its near-dup
    *     cluster; `blame_id` names the cluster keeper it lost to;
    *   - `fate = 'kept'`     — survived everything; carries the same
    *     `split`/`pack_id` the pipeline assigns.
    *
    * Decisions are guaranteed identical to [[curateCorpus]] because
    * the stages are THE SAME CODE, not a re-derivation: the quality
    * predicate is the same repetitionStats semi-join shape, clustering
    * is [[Dedup.corpusComponents]] (the prelude `dedupCorpusTransitive`
    * itself runs), and split/pack run the same [[datasetSplit]]/
    * [[packSequences]] over the survivors — CurationAuditSpec pins
    * `fate = 'kept'` ≡ the pipeline's output ids. Scale shape matches
    * the pipeline's (the verdict union adds two row-local branches).
    */
  def curationAudit(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String, minTokens: Int = 20,
                    dedupThreshold: Double = 0.5, trainPct: Int = 80,
                    valPct: Int = 10, packBudget: Long = 256L): DataFrame = {
    val (withN, base) = qualityBase(docs, idCol, textCol, minTokens)
    val (input, comps) =
      Dedup.corpusComponents(base, idCol, textCol, k = 3, dedupThreshold)
    val kept = input.join(
      comps.filter(col(idCol) === col("component")).select(idCol),
      Seq(idCol), "left_semi")
    val packed = packSequences(
      datasetSplit(kept, idCol, trainPct, valPct)
        .withColumn("__stratum", concat_ws("|", col("split"), col(sourceCol))),
      idCol, "n_tokens", packBudget, "__stratum")
      .select(col(idCol), col("split"), col("pack_id"))
    val labeled = withN.select(col(idCol), col(sourceCol), col("n_tokens"))
      .join(comps.withColumnRenamed(idCol, "__cid")
        .select(col("__cid"), col("component")),
        col(idCol) === col("__cid"), "left")
      .join(packed, Seq(idCol), "left")
    labeled.select(col(idCol), col(sourceCol), col("n_tokens"),
      when(col("__cid").isNull, lit("quality"))
        .when(col("component") =!= col(idCol), lit("near_dup"))
        .otherwise(lit("kept")).as("fate"),
      when(col("__cid").isNotNull && col("component") =!= col(idCol),
        col("component")).as("blame_id"),
      col("split"), col("pack_id"))
  }

  /** Ids the trained model-quality gate keeps: docs whose margin under
    * the corpus-trained discriminant reaches the corpus mean
    * ([[Classify.marginGate]] — see there for why the threshold, not
    * the perceptron sign, is the filter). Docs the model cannot score
    * (null/empty text → no features) are NOT kept — an unscorable doc
    * is exactly what a model filter must refuse to vouch for.
    *
    * The gate id set is stabilized and MEMOIZED per (session, input
    * plan, params): a session that runs both [[curateCorpusModel]] and
    * [[curationAuditModel]] over the same corpus trains the
    * discriminant ONCE and both consume the materialized id frame —
    * at 100 TB the training epochs are the dominant cost of the model
    * stage and re-deriving them for the audit twin doubles it for no
    * semantic gain (the gate is deterministic given its input).
    * Contract: within-session reuse keyed on the ANALYZED plan's
    * semantic hash — re-reading a path whose files were overwritten
    * mid-session returns the materialized (pre-overwrite) gate, the
    * same snapshot semantics every stabilized subtree here has.
    */
  def modelQualityIds(docs: DataFrame, idCol: String, textCol: String,
                      buckets: Int = 1024, minStop: Int = 2): DataFrame =
    graft.Memo.shared(
      graft.Memo.dfKey(docs, "modelGate", idCol, textCol, buckets, minStop)) {
      graft.Checkpoints.stabilize(
        Classify.marginGate(docs, idCol, textCol, buckets, minStop))
    }

  /** Shared quality stage of [[curateCorpus]] and [[curationAudit]]:
    * `(withN, base)` where `withN` is the input with its token count
    * (checkpointed — it feeds verdicts AND the gate) and `base` the
    * quality survivors (Gopher repetition pass AND ≥ minTokens).
    * Memoized per (session, input plan, params) so a pipeline and its
    * audit twin in one session build the stage once — which also makes
    * their downstream clustering preludes structurally identical and
    * therefore shareable ([[Dedup.corpusComponents]]).
    */
  private def qualityBase(docs: DataFrame, idCol: String, textCol: String,
                          minTokens: Int): (DataFrame, DataFrame) =
    graft.Memo.shared(
      graft.Memo.dfKey(docs, "qualityBase", idCol, textCol, minTokens)) {
      // the tokenized frame feeds the repetition gate, the base
      // branch, AND (via the memo) the audit twin's verdict join —
      // materializing it once beats re-tokenizing the corpus per
      // consumer. A session that runs ONLY the bare pipeline and
      // wants to avoid the full-corpus executor-disk write can set
      // spark.graft.shareQualityBase=false (frames stay lazy; the
      // downstream memos still share because the PLAN objects are
      // shared).
      val share = docs.sparkSession.conf
        .get("spark.graft.shareQualityBase", "true").toBoolean
      val withNLazy = docs.withColumn("n_tokens",
        size(Portable.tokens(col(textCol))).cast("long"))
      val withN = if (share) withNLazy.localCheckpoint() else withNLazy
      val pass = TextOps.repetitionStats(withN, idCol, textCol)
        .filter(col("gopher_pass")).select(col(idCol))
      val base = withN.filter(col("n_tokens") >= minTokens)
        .join(pass, Seq(idCol), "left_semi")
      (withN, base)
    }

  /** [[curateCorpus]] with the CCNet stage order: MODEL-quality gate
    * (the corpus-trained perceptron) in front of the heuristic gates —
    * model filter → Gopher repetition + min tokens → transitive
    * near-dup dedup → split → pack. The model stage adds the training
    * epochs (tiny weight table, AQE-broadcast joins) plus ONE
    * left-semi join on doc id to the pipeline's cost; everything
    * downstream sees a smaller corpus, which at 100 TB is the point of
    * gating early. Same [[graft.Memo]] snapshot semantics as
    * [[curateCorpus]]: same-session re-calls over the same logical
    * input reuse materialized stages even if files changed on disk
    * ([[graft.Memo.clear]] forces re-reads).
    */
  def curateCorpusModel(docs: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, minTokens: Int = 20,
                        dedupThreshold: Double = 0.5, trainPct: Int = 80,
                        valPct: Int = 10, packBudget: Long = 256L,
                        buckets: Int = 1024,
                        minStop: Int = 2): DataFrame = {
    // the gate frame is stabilized + memoized inside modelQualityIds,
    // so the audit twin running in the same session reuses it
    val keep = modelQualityIds(docs, idCol, textCol, buckets, minStop)
    curateCorpus(docs.join(keep, Seq(idCol), "left_semi"), idCol, textCol,
      sourceCol, minTokens, dedupThreshold, trainPct, valPct, packBudget)
  }

  /** Audit twin of [[curateCorpusModel]]: [[curationAudit]] over the
    * model-gate survivors, plus a `fate = 'model_filtered'` verdict
    * row for every doc the perceptron refused — the same
    * "no document vanishes silently" contract with the model stage
    * first. The gate id set is stabilized once and feeds both the
    * semi- and anti-join, so the training epochs run exactly once.
    */
  def curationAuditModel(docs: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, minTokens: Int = 20,
                         dedupThreshold: Double = 0.5, trainPct: Int = 80,
                         valPct: Int = 10, packBudget: Long = 256L,
                         buckets: Int = 1024,
                         minStop: Int = 2): DataFrame = {
    val keep = modelQualityIds(docs, idCol, textCol, buckets, minStop)
    val audited = curationAudit(docs.join(keep, Seq(idCol), "left_semi"),
      idCol, textCol, sourceCol, minTokens, dedupThreshold, trainPct,
      valPct, packBudget)
    val idType = docs.schema(idCol).dataType
    val dropped = docs.join(keep, Seq(idCol), "left_anti")
      .select(col(idCol), col(sourceCol),
        size(Portable.tokens(col(textCol))).cast("long").as("n_tokens"),
        lit("model_filtered").as("fate"),
        lit(null).cast(idType).as("blame_id"),
        lit(null).cast("string").as("split"),
        lit(null).cast("long").as("pack_id"))
    audited.unionByName(dropped)
  }

  /** Quality-curriculum training order: every labeled doc stamped with
    * a global 1..n rank by DESCENDING model quality (epoch-1 margin,
    * doc-id ties) — highest-confidence prose first, the
    * curriculum-learning order a data loader consumes directly. The
    * global stamp is [[Scale.denseIds]] (range-repartition +
    * zipWithIndex), NOT a single-partition window, so the ordering
    * pass scales with the cluster.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
                      buckets: Int = 1024, minStop: Int = 2): DataFrame = {
    val margins = Classify.perceptronQuality(docs, idCol, textCol,
      buckets, epochs = 1, minStop = minStop)
      .select(col(idCol), col("margin"))
    Scale.denseIds(margins,
      Seq(col("margin").desc, col(idCol).asc), "rid")
      .select(col("rid"), col(idCol), col("margin"))
  }

  /** Fixed-window document chunking with overlap — the pre-embedding
    * step of a retrieval/training pipeline: token windows of
    * `chunkSize` starting every `chunkSize - overlap` tokens. Pure
    * row-local explode (chunk starts come from one `sequence`), so the
    * corpus scan fans out to chunks without any shuffle. Every doc
    * yields at least one chunk (the last may be short); `chunk_idx` is
    * 0-based and dense.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val t = Portable.tokens(col(textCol))
    df.withColumn("__toks", t)
      .withColumn("__start",
        explode(sequence(lit(1), greatest(size(col("__toks")), lit(1)),
          lit(stride))))
      .select(col(idCol),
        ((col("__start") - 1) / stride).cast("long").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Domain-mixture resampling: re-weight a corpus to target per-group
    * rates (e.g. "2.5× epochs of wiki, 0.3× of web crawl") with
    * deterministic hash arithmetic. A rate r emits floor(r) copies of
    * every row plus one more for rows whose hash bucket falls under
    * the fractional part — so E[copies] = r (exact for rates that are
    * multiples of 1/10000; the bucket space is basis points),
    * reproducible on any engine/partitioning.
    *
    * Entirely row-local (a when-chain of constants and one
    * explode) — zero shuffles, zero joins; the one operator every
    * training-data pipeline runs immediately before sequence packing.
    * Rows of groups not in `rates` get the `default` rate. Output
    * carries `copy_idx` (1-based) so downstream shuffles can keep
    * replicas apart.
    */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
                    rates: Map[String, Double], default: Double = 1.0)
      : DataFrame = {
    require(rates.values.forall(_ >= 0) && default >= 0,
      "mixture rates must be non-negative")
    val rate = rates.foldLeft(lit(default)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    val whole = floor(rate).cast("int")
    // fractional part in integer BASIS POINTS over 10000 hash buckets:
    // rates are honored to 0.01% granularity (a percent bucket space
    // would quantize e.g. 0.125 to 0.13), and the round() keeps the
    // tie-break arithmetic exact on both engines
    val fracBp = round((rate - floor(rate)) * 10000).cast("int")
    val copies =
      whole + when(hashBucket(col(keyCol), 10000) < fracBp, 1).otherwise(0)
    // sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — rate-0
    // rows must map to an empty array so explode drops them
    df.withColumn("copy_idx",
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** Deterministic source-INTERLEAVED training order: documents are
    * round-robined across groups (rank 1 of every source, then rank 2
    * of every source, …) with hash-shuffled order inside each group —
    * the shard-mixing pass before writing training data, so no shard
    * is a solid block of one domain and the "shuffle" is reproducible
    * on any engine (no RNG). One window per group for the intra-group
    * rank, then [[graft.operators.Scale.denseIds]] stamps the global
    * order without a single-partition window.
    */
  def interleaveBySource(df: DataFrame, keyCol: String,
                         groupCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Portable.hash32(col(keyCol).cast("string")), col(keyCol))
    val ranked = df.withColumn("__grank", row_number().over(w))
    graft.operators.Scale.denseIds(ranked,
      Seq(col("__grank"), col(groupCol), col(keyCol)), "rid")
      .drop("__grank")
  }

  /** Token-BUDGETED domain downsampling: each group is hash-sampled
    * down to ≈ `budgetTokens` of its token mass (groups already under
    * budget pass whole). Unlike [[mixtureSample]] the rates are
    * DATA-DEPENDENT — rate_g = min(1, budget / Σ tokens_g) — computed
    * as an aggregate and broadcast-joined back, so nothing ever hits
    * the driver and the rates track the corpus as it grows. Unlike
    * [[tokenBudgetCap]] (exact cumulative cut in hash order, one
    * window shuffle per group) this is a row-local Bernoulli gate
    * after one tiny aggregate: E[kept tokens] ≈ budget rather than an
    * exact ≤-budget prefix — the cheap form you run over 100 TB when
    * ±1% of budget is fine and a per-group window is not.
    *
    * Deterministic: the keep decision is the same hash-bucket
    * arithmetic as mixtureSample but over 10⁸ buckets — data-dependent
    * rates can be far smaller than hand-picked mixture rates (a 1 M
    * budget against a 25 B-token domain is rate 4·10⁻⁵, which a
    * basis-point space would round to ZERO and silently drop the whole
    * domain), and the threshold floors at one bucket so an
    * under-represented rate keeps a trickle rather than nothing. Still
    * reproducible on any engine and oracled exactly.
    */
  def budgetedSample(df: DataFrame, keyCol: String, groupCol: String,
                     tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    val Buckets = 100000000L
    // coalesce: a group whose token column is entirely NULL has no
    // measurable mass — it passes whole (rate 1.0 via div-by-zero →
    // +Inf → least) rather than silently vanishing on a NULL rate
    val totals = df.groupBy(col(groupCol))
      .agg(coalesce(sum(col(tokensCol)), lit(0L)).as("__total"))
      .withColumn("__rate",
        least(lit(1.0), lit(budgetTokens.toDouble) / col("__total")))
    val rateB = greatest(lit(1L),
      round(col("__rate") * Buckets).cast("long"))
    df.join(broadcast(totals), Seq(groupCol))
      .filter(hashBucket(col(keyCol), Buckets.toInt) < rateB)
      .drop("__total", "__rate")
  }
}
