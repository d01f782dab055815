package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Text-analysis operators for the training-data-pipeline surface
  * (beyond reference parity — the reference processes numeric
  * measurement tables only). All are narrow, codegen-friendly column
  * expressions: no UDFs, no shuffles except where a groupBy is the
  * semantic (so the same plan scales to a partitioned 100 TB corpus —
  * each doc is scored independently, embarrassing parallelism).
  */
object TextOps {

  /** Language marker profiles: high-frequency function-word /
    * character-sequence markers per language. Scoring = total
    * occurrence count of each language's markers; argmax wins, ties
    * broken by language code ascending, zero evidence → "und".
    * Deliberately substring-based (no regex dialect dependence) so the
    * DuckDB oracle can mirror it exactly.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die ", "sch", " nicht "),
    "en" -> Seq(" the ", " and ", " of ", " is ", "ing "),
    "es" -> Seq(" el ", " de ", " que ", "ción", " los "),
    "fr" -> Seq(" le ", " les ", " des ", " est ", " une "),
    "zh" -> Seq("的", "是", "了", "在", "我"),
  )

  /** Occurrence count of literal `needle` in `c`:
    * (len(s) - len(replace(s, needle, ''))) / len(needle). Literal
    * `replace`, not regex — portable to any SQL engine with
    * replace/length and no regex-dialect dependence.
    */
  def occCount(c: Column, needle: String): Column =
    (length(c) - length(replace(c, lit(needle), lit("")))) / lit(needle.length)

  /** Language-ID: argmax marker score with deterministic tie-break
    * (language code ascending = profile order), "und" when no marker
    * hits. Text is space-padded so word-boundary markers match at the
    * edges.
    */
  def languageId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    // ONE single-pass multi-needle count (native expression) instead
    // of 25 replace-based copies of the text per row — counts are
    // contract-identical to occCount, so no oracle changes; per-lang
    // scores are element sums over the shared counts array (one
    // evaluation under codegen subexpression elimination)
    val markers = langProfiles.flatMap(_._2)
    val counts = graft.expressions.TextExpressions
      .multiOccCount(padded, markers)
    val offsets = langProfiles.map(_._2.size).scanLeft(0)(_ + _)
    val scores: Seq[(String, Column)] =
      langProfiles.zip(offsets).map { case ((lang, ms), off) =>
        lang -> ms.indices
          .map(j => element_at(counts, off + j + 1))
          .reduce(_ + _)
      }
    val n = scores.size
    // Argmax via ONE struct-greatest, not a best-so-far when-fold: the
    // fold nests every earlier score inside every later branch —
    // O(langs²) copies of the marker-count subtrees, which blows the
    // whole-stage-codegen method limit, and the interpreted fallback
    // has no subexpression elimination (measured 20-60× slower at
    // sf0.1). Here each score appears EXACTLY once; structs compare
    // lexicographically, and the reversed index field breaks score
    // ties toward the EARLIER profile entry (alphabetically smaller
    // language) — the same semantics the fold had and the oracle CASE
    // chain keeps.
    val best = greatest(scores.zipWithIndex.map { case ((lang, sc), i) =>
      struct(sc.as("s"), lit(n - 1 - i).as("r"), lit(lang).as("l"))
    }: _*)
    // null text stays null (the SQL CASE with no ELSE an oracle
    // writes yields NULL there — 'und' would silently diverge)
    when(text.isNull, lit(null).cast("string"))
      .otherwise(when(best.getField("s") > 0, best.getField("l"))
        .otherwise(lit("und")))
  }

  /** Token statistics: n_tokens, n_distinct_tokens, avg token length
    * (double). One pass, no shuffle.
    */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = Portable.tokens(col(textCol))
    df.withColumn("n_tokens", size(t))
      .withColumn("n_distinct_tokens", size(array_distinct(t)))
      .withColumn("avg_token_len",
        aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double")
          / size(t).cast("double"))
  }

  /** Quality scoring: length, lexical-diversity ratio, stopword ratio,
    * non-alphanumeric ratio, and a weighted composite in [0,1]-ish.
    * Heuristics follow the published CCNet/Gopher-style text-quality
    * filters (ratio features over a doc; fixed weights).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = Portable.tokens(col(textCol))
    val nTok = size(t).cast("double")
    val distinctRatio = size(array_distinct(t)).cast("double") / nTok
    val stopRatio =
      size(filter(t, x => x.isin(stopwords: _*))).cast("double") / nTok
    val alnum = regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", "")
    // try_divide: an empty-string doc has length 0, and 0/0 throws
    // under Spark 4's default ANSI mode (null ratio instead)
    val nonAlnumRatio = try_divide(
      (length(col(textCol)) - length(alnum)).cast("double"),
      length(col(textCol)).cast("double"))
    df.withColumn("n_tokens", size(t))
      .withColumn("distinct_ratio", round(distinctRatio, 6))
      .withColumn("stopword_ratio", round(stopRatio, 6))
      .withColumn("non_alnum_ratio", round(nonAlnumRatio, 6))
      .withColumn("quality_score",
        round(lit(0.4) * distinctRatio + lit(0.3) * stopRatio
          + lit(0.3) * (lit(1.0) - nonAlnumRatio), 6))
  }

  /** Lexical-diversity profile: per-doc type-token ratio, hapax
    * ratio, Yule's K, and inverse-Simpson effective vocabulary — the
    * classic lexical-richness statistics used as corpus-quality
    * signals beside [[withQuality]]'s ratio features (templated or
    * machine-generated text shows low effective vocabulary and low
    * hapax mass even at an ordinary distinct-token ratio).
    *
    * Everything derives from the per-doc token-count multiset {c}:
    * n = Σc, V = |types|, V1 = |{c = 1}|, S2 = Σc². Then
    * ttr = V/n, hapax_ratio = V1/V, yule_k = 10⁴·(S2−n)/n²,
    * eff_vocab = n²/S2 — all ratios of EXACT integers (the house
    * log-free rule: no cross-engine libm drift), so the DuckDB oracle
    * matches bit-for-bit after the shared round(·,6).
    *
    * ZERO-SHUFFLE: the multiset folds row-locally over the SORTED
    * token array (equal tokens are adjacent, so run boundaries yield
    * the counts) — no explode, no (doc, token) exchange. At 100 TB
    * the profile rides the document scan like the other row-local
    * scorers: per-partition CPU, zero network.
    */
  def lexicalDiversity(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    // materialized once; both size() and the fold read the attribute
    val withToks = df.select(col(idCol),
      array_sort(filter(Portable.tokens(col(textCol)),
        x => length(x) > lit(0))).as("__lx_toks"))
    val toks = col("__lx_toks")
    val folded = aggregate(
      toks,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("types"), lit(0L).as("hapax"), lit(0L).as("sumsq")),
      (acc, x) => {
        val run = acc.getField("run")
        when(acc.getField("prev") <=> x,
          struct(x.as("prev"), (run + lit(1L)).as("run"),
            acc.getField("types").as("types"),
            acc.getField("hapax").as("hapax"),
            acc.getField("sumsq").as("sumsq")))
          .otherwise(struct(x.as("prev"), lit(1L).as("run"),
            (acc.getField("types") + lit(1L)).as("types"),
            (acc.getField("hapax")
              + when(run === 1L, 1L).otherwise(0L)).as("hapax"),
            (acc.getField("sumsq") + run * run).as("sumsq")))
      },
      // close the final run; an empty array stays all-zero (run = 0)
      acc => struct(
        acc.getField("types").as("types"),
        (acc.getField("hapax")
          + when(acc.getField("run") === 1L, 1L).otherwise(0L)).as("hapax"),
        (acc.getField("sumsq")
          + acc.getField("run") * acc.getField("run")).as("sumsq")))
    val base = withToks.select(col(idCol),
      size(toks).cast("long").as("n_tokens"), folded.as("__lx"))
    val n = col("n_tokens")
    val v = col("__lx.types")
    val v1 = col("__lx.hapax")
    val s2 = col("__lx.sumsq")
    // try_divide: n = 0 (or V = 0 / S2 = 0) → null, not an ANSI error
    base.select(col(idCol), n,
      v.as("n_types"), v1.as("n_hapax"),
      round(try_divide(v.cast("double"), n.cast("double")), 6).as("ttr"),
      round(try_divide(v1.cast("double"), v.cast("double")), 6)
        .as("hapax_ratio"),
      round(try_divide(lit(10000.0) * (s2 - n).cast("double"),
        (n * n).cast("double")), 6).as("yule_k"),
      round(try_divide((n * n).cast("double"), s2.cast("double")), 6)
        .as("eff_vocab"))
  }

  /** BPE-ish subword-boundary tokenization (GPT-2-style pattern:
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs). A real BPE merges pairs against a vocab; this
    * regex pass gives the token-boundary statistics a data pipeline
    * needs (length filtering, cost estimation) without a vocab file.
    * RE2-safe (no backrefs/lookahead) so DuckDB mirrors it verbatim.
    */
  val bpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Document fingerprint: 31-ary rolling hash over the token-hash
    * sequence, mod Portable.P — order-sensitive, so word-order edits
    * change the fingerprint (unlike a bag-of-words hash). Seeded with
    * the first token's hash; empty/whitespace-only docs get -1 (the
    * explicit trim guard, because split("") yields [""] — a single
    * empty token — so a size check alone can never fire); null text
    * stays null.
    */
  def fingerprint(text: Column): Column = {
    val hs = transform(Portable.tokens(text), x => Portable.hash32(x))
    // NB: slice(hs, 2, Int.MaxValue) silently yields an empty fold
    // inside aggregate() (codegen start+length int overflow) — the
    // tail length must be a computed column.
    when(trim(text) === "" || size(hs) === 0, lit(-1L)).otherwise(
      aggregate(slice(hs, lit(2), greatest(size(hs) - 1, lit(0))),
        element_at(hs, 1),
        (acc, x) => (acc * 31 + x) % Portable.P))
  }

  /** Gopher-style repetition statistics (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A1.1 — published filter
    * family): per document, the fraction of n-grams claimed by the
    * single most frequent n-gram (n = 2, 3) and the fraction of
    * n-grams that occur more than once (n = 5). High values mark
    * boilerplate / degenerate repetition.
    *
    * Plan shape: this is deliberately NOT a per-row HOF fold — counting
    * the mode of a row's n-gram multiset with nested lambdas is O(n·d)
    * per row AND interpreted (no codegen for lambda bodies). Instead
    * the n-grams for all three n explode from one token-array
    * projection into (id, n, gram) rows, one groupBy counts each gram,
    * a second rolls up per (id, n), and a 3-value pivot widens — every
    * step map-side-combinable and shuffle-keyed on the doc id, so the
    * same plan runs at corpus scale with no per-row quadratic work.
    */
  val repetitionNs: Seq[Int] = Seq(2, 3, 5)

  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      top2Max: Double = 0.20, top3Max: Double = 0.18,
                      dup5Max: Double = 0.15): DataFrame = {
    val grams = df
      .select(col(idCol), Portable.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(array(repetitionNs.map(n =>
        struct(lit(n).as("n"), Portable.shingles(col("__toks"), n).as("gs"))): _*))
        .as("__t"))
      .select(col(idCol), col("__t.n").as("n"), explode(col("__t.gs")).as("g"))
    val counts = grams.groupBy(col(idCol), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val stats = counts.groupBy(col(idCol), col("n"))
      .agg(max("c").as("mx"), sum("c").as("tot"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
    val wide = stats.groupBy(col(idCol))
      .pivot("n", repetitionNs.map(_.toString))
      .agg(first("mx").as("mx"), first("tot").as("tot"), first("dup").as("dup"))
    val top2 = round(col("2_mx").cast("double") / col("2_tot"), 6)
    val top3 = round(col("3_mx").cast("double") / col("3_tot"), 6)
    val dup5 = round(col("5_dup").cast("double") / col("5_tot"), 6)
    df.select(col(idCol))
      .join(wide, Seq(idCol), "left")
      .select(col(idCol),
        top2.as("top_bigram_frac"),
        top3.as("top_trigram_frac"),
        dup5.as("dup_5gram_frac"),
        (coalesce(top2, lit(0.0)) <= top2Max
          && coalesce(top3, lit(0.0)) <= top3Max
          && coalesce(dup5, lit(0.0)) <= dup5Max).as("gopher_pass"))
  }

  /** Text-cleaning patterns — every regex here is RE2-safe (no
    * backreferences, no lookaround) so DuckDB's regexp_replace mirrors
    * it verbatim. Redaction placeholders follow the common
    * pseudonymization convention of published pipeline stacks.
    */
  val htmlTagPattern = "<[^>]*>"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** Strip markup tags to spaces, collapse whitespace runs, trim —
    * the standard pre-tokenization cleanup pass. Row-local, codegen'd.
    */
  def stripHtml(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, htmlTagPattern, " "),
      "[ \\t\\r\\n]+", " "))

  /** Redact emails, then phone numbers, then bare IPv4s (order
    * matters: an IP-looking fragment inside an email must be consumed
    * by the email pass first). Row-local, no shuffle — at 100 TB this
    * runs as a map over the corpus scan.
    */
  def redactPii(c: Column): Column = {
    val e = regexp_replace(c, emailPattern, "[EMAIL]")
    val p = regexp_replace(e, phonePattern, "[PHONE]")
    regexp_replace(p, ipv4Pattern, "[IP]")
  }

  /** Count of PII matches of `pattern` in `c` — audit metric for a
    * redaction pass (regexp_count is codegen'd in Spark 4).
    */
  def piiCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))

  /** Row-local twin of [[repetitionStats]] for STREAMING gates: the
    * distributed form needs two aggregations + a pivot (fine for
    * batch, impossible per-row in an append-mode stream), so this one
    * computes the same three fractions with array HOFs inside the row.
    * Interpreted and O(grams × distinct grams) per row — use it for
    * per-event filtering where rows are single documents; batch scans
    * should stay on [[repetitionStats]]. Spec-pinned equal to the
    * distributed form on the same input.
    */
  def repetitionPassLocal(text: Column, top2Max: Double = 0.20,
                          top3Max: Double = 0.18,
                          dup5Max: Double = 0.15): Column = {
    def fracs(toks: Column, n: Int): (Column, Column) = {
      val g = Portable.shingles(toks, n)
      val counts = transform(array_distinct(g),
        x => size(filter(g, y => y === x)))
      // empty gram list → null (NOT 0/0: double division yields NaN,
      // and coalesce(NaN, 0) is NaN, which would silently FAIL the
      // gate where the distributed form's missing-group null passes)
      val empty = size(g) === 0
      val top = when(empty, lit(null).cast("double"))
        .otherwise(array_max(counts).cast("double") / size(g))
      val dup = when(empty, lit(null).cast("double"))
        .otherwise(aggregate(counts, lit(0),
          (acc, c) => acc + when(c > 1, c).otherwise(0)).cast("double")
          / size(g))
      (top, dup)
    }
    val toks = Portable.tokens(text)
    val (top2, _) = fracs(toks, 2)
    val (top3, _) = fracs(toks, 3)
    val (_, dup5) = fracs(toks, 5)
    (coalesce(round(top2, 6), lit(0.0)) <= top2Max
      && coalesce(round(top3, 6), lit(0.0)) <= top3Max
      && coalesce(round(dup5, 6), lit(0.0)) <= dup5Max)
  }

  /** Per-group corpus profile: the summary report a curation run
    * prints — doc counts, token totals/means, exact interpolated
    * token-count percentiles, language spread. One groupBy on the
    * profile key; `percentile` is Spark's exact interpolated
    * aggregate, mirrored by DuckDB's `quantile_cont`.
    */
  def corpusProfile(df: DataFrame, textCol: String, groupCol: String,
                    langCol: String = "lang"): DataFrame =
    df.select(col(groupCol), col(langCol).as("__lang"),
      size(Portable.tokens(col(textCol))).cast("long").as("__nt"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("__nt").as("total_tokens"),
        round(avg("__nt"), 6).as("avg_tokens"),
        round(expr("percentile(__nt, 0.5)"), 6).as("p50_tokens"),
        round(expr("percentile(__nt, 0.9)"), 6).as("p90_tokens"),
        countDistinct(col("__lang")).as("n_langs"))

  /** Scale twin of [[corpusProfile]]: `approx_percentile` (a mergeable
    * quantile sketch, combined map-side like any partial aggregate)
    * instead of the exact interpolated percentile, which at 100 TB
    * must buffer and sort every group's values. `accuracy` is Spark's
    * inverse-epsilon knob: rank error ≤ 1/accuracy, memory
    * O(accuracy) per group. Language cardinality likewise goes through
    * `approx_count_distinct` (HyperLogLog++, one-pass mergeable —
    * exact `countDistinct` plans as an Expand + second aggregation
    * phase, doubling the shuffle) — exact for small cardinalities like
    * language counts, ~2% rsd beyond. The exact form stays the oracle
    * mode — approx_percentile picks an actual element (no
    * interpolation), so the two agree only to rank tolerance, which
    * the spec bounds.
    */
  def corpusProfileApprox(df: DataFrame, textCol: String, groupCol: String,
                          langCol: String = "lang",
                          accuracy: Int = 10000): DataFrame =
    df.select(col(groupCol), col(langCol).as("__lang"),
      size(Portable.tokens(col(textCol))).cast("long").as("__nt"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("__nt").as("total_tokens"),
        round(avg("__nt"), 6).as("avg_tokens"),
        // cast to double for schema parity with the exact profile
        // (percentile interpolates → double; the sketch returns an
        // actual element of the long-typed input)
        round(expr(s"approx_percentile(__nt, 0.5, $accuracy)")
          .cast("double"), 6).as("p50_tokens"),
        round(expr(s"approx_percentile(__nt, 0.9, $accuracy)")
          .cast("double"), 6).as("p90_tokens"),
        approx_count_distinct(col("__lang"), rsd = 0.02).as("n_langs"))

  /** Corpus-level boilerplate n-grams: k-word shingles present in at
    * least `minDocs` distinct documents (headers, footers, license
    * blurbs, navigation chrome). One groupBy on the shingle key over
    * the distinct (doc, shingle) table — map-side combinable, shuffle
    * rows are shingles not documents, and the threshold filter runs
    * post-agg so rare shingles never leave the aggregation.
    */
  def boilerplateNgrams(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, minDocs: Long = 5): DataFrame =
    Dedup.docShingles(df, idCol, textCol, k, dedup = true)
      .groupBy("shingle")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** n-gram coverage score — the LM-lite fluency proxy: what fraction
    * of a doc's distinct k-shingles also occur in at least `minDf`
    * OTHER corpus docs? A true LM perplexity filter needs float
    * log-probs (never bit-stable cross-engine) and a trained model;
    * shingle coverage is the integer-exact stand-in with the same
    * discriminative shape — gibberish and boilerplate-free OCR noise
    * score near 0 because their word sequences recur nowhere, while
    * ordinary prose overlaps the corpus heavily. Scores are ratios of
    * integer counts (round 6 only at the edge), so the gate decision
    * is engine-portable.
    *
    * Plan: one distinct (doc, shingle) table localCheckpoint'ed to
    * feed both sides; df per shingle is a map-side-combined groupBy;
    * "known" = df ≥ minDf+1 total docs (the doc itself plus minDf
    * others when counting its own shingle) is a broadcast-free
    * shingle-keyed join; one groupBy per doc scores. Shuffles carry
    * shingles and doc ids only.
    *
    * Output: (idCol, n_shingles, n_known, coverage) for every doc;
    * docs shorter than k tokens get 0 shingles and null coverage.
    */
  def ngramCoverage(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, minDf: Long = 3): DataFrame = {
    val sh = Dedup.docShingles(df, idCol, textCol, k, dedup = true)
      .localCheckpoint()
    val common = sh.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      // the doc itself always counts itself once — "minDf others"
      .filter(col("df") >= minDf + 1)
      .select("shingle")
    val known = sh.join(common, Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_known"))
    val totals = sh.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(known, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        round(coalesce(col("n_known"), lit(0L)).cast("double")
          / col("n_shingles"), 6).as("coverage"))
  }

  /** Keyword retrieval: top-k docs for a query string, scored by the
    * log-free tf-idf this module uses everywhere (score contribution
    * of query term t in doc d = tf(d,t) · N · SCALE div df(t), all in
    * INTEGER micro-units with truncating division — sums of integers
    * are order-free, where a float Σ tf·N/df would be partition-order
    * dependent and never hash-stable). The inverted-index shape: the
    * tf table is filtered to the query's terms FIRST (a handful of
    * tokens — at scale this is the posting-list read, everything else
    * pruned), df counted over those postings only, one groupBy per doc
    * sums the score, GroupedTopK-shaped rank tail.
    */
  def searchTopK(df: DataFrame, idCol: String, textCol: String,
                 query: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Scale = 1000000L
    val qTerms = query.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "empty query")
    val n = df.select(count(lit(1)).as("__n"))
    val tf = df
      .select(col(idCol), explode(Portable.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(qTerms: _*))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(n))
      .withColumn("__s", col("tf") * expr(s"(__n * $Scale) div df"))
      .groupBy(col(idCol)).agg(sum(col("__s")).as("score"),
        count(lit(1)).as("n_terms"))
    // TakeOrdered first (distributed top-k), THEN number the k rows —
    // a row_number window over the full match set would be the
    // single-partition global-window trap
    val top = scored.orderBy(col("score").desc, col(idCol)).limit(k)
    val w = Window.orderBy(col("score").desc, col(idCol))
    top.withColumn("rank", row_number().over(w).cast("int"))
      .select(col("rank"), col(idCol), col("score"), col("n_terms"))
  }

  /** BM25 retrieval — [[searchTopK]]'s tf-idf with the two things BM25
    * actually adds: tf SATURATION (a term's 50th occurrence is worth
    * almost nothing more than its 10th) and LENGTH NORMALIZATION (long
    * docs stop winning just by containing everything). Classic
    * constants k1 = 1.2, b = 0.75 are folded into ONE integer rational
    * so every per-term score stays in integer milli/micro-units and the
    * per-doc sum is order-free (hash-stable on any engine, like every
    * score in this module):
    *
    *   tfsat = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))
    *         = 44·T·tf / (20·T·tf + 6·T + 18·dl·N)     (exact, k1=6/5, b=3/4)
    *
    * scaled ×1000 with truncating div; idf is the module's log-free
    * (N·10⁶ div df). score = Σ_t idf(t) · tfsat_milli(t,d).
    *
    * Scale shape: identical to searchTopK — postings for the query's
    * terms only, df over those postings, broadcast scalars (N, T), one
    * groupBy per doc, TakeOrdered tail. dl is row-local (no extra
    * shuffle). UNIT CONTRACT: 44000·T·tf must fit signed 64-bit —
    * fine to ~10¹³ corpus tokens with tf ≤ ~40; beyond that drop the
    * milli scale to 10 (same truncation convention as bpe/lm scores).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               query: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qTerms = query.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "empty query")
    val base = df
      .select(col(idCol), Portable.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        size(col("__toks")).cast("long").as("__dl"))
    val stats = base.agg(count(lit(1)).as("__n"), sum("__dl").as("__t"))
    val tf = base
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("token"))
      .filter(col("token").isin(qTerms: _*))
      .groupBy(col(idCol), col("__dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("__s",
        expr("((__n * 1000000) div df) * " +
          "((44000 * __t * tf) div (20 * __t * tf + 6 * __t + 18 * __dl * __n))"))
      .groupBy(col(idCol))
      .agg(sum(col("__s")).as("score"), count(lit(1)).as("n_terms"))
    val top = scored.orderBy(col("score").desc, col(idCol)).limit(k)
    val w = Window.orderBy(col("score").desc, col(idCol))
    top.withColumn("rank", row_number().over(w).cast("int"))
      .select(col("rank"), col(idCol), col("score"), col("n_terms"))
  }

  /** Reciprocal-rank fusion of two ranked retrieval lists — the
    * standard hybrid-search combiner (lexical BM25 + vector KNN):
    * score(d) = Σ_lists 1/(c + rank_list(d)), c = 60 from the RRF
    * literature, here in integer micro-units (10⁶ div (c + rank)) so
    * the fusion is order-free and hash-stable like every score in
    * this module. A doc missing from one list contributes 0 from it
    * (full outer join on the id). Both inputs are top-k-sized — the
    * fusion never touches the corpus, so its cost is independent of
    * corpus scale; ranking is the TakeOrdered + k-row window tail
    * shared with [[searchTopK]].
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              aRankCol: String, bRankCol: String, k: Int = 10,
              c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = a.join(b, Seq(idCol), "full")
      .withColumn("rrf_score",
        coalesce(expr(s"1000000 div ($c + $aRankCol)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($c + $bRankCol)"), lit(0L)))
    val top = joined.orderBy(col("rrf_score").desc, col(idCol)).limit(k)
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    top.withColumn("rank", row_number().over(w).cast("int"))
      .select(col("rank"), col(idCol), col("rrf_score"),
        col(aRankCol), col(bRankCol))
  }

  /** Distributed BPE vocabulary induction — tokenizer merge training
    * at corpus scale. The scale move is step 0: collapse the corpus to
    * its WORD HISTOGRAM (one groupBy; 100 TB of text becomes a
    * vocab-sized (word, freq) table), then every merge round runs over
    * the histogram only:
    *   1. adjacent-pair counts: one explode over each word's current
    *      symbol array, weighted by freq, map-side combined;
    *   2. argmax pair (ties break lexicographically — byte order,
    *      identical on any engine): a 1-row TakeOrdered to the driver,
    *      a scalar probe, not a data collect;
    *   3. the merge applied to every word by a left-to-right
    *      `aggregate` fold. Greedy non-overlap comes free: a merged
    *      token is strictly longer than its left part, so the fold can
    *      never re-merge into a token it just created ("aaa" + (a,a) →
    *      [aa, a], never [aa, aa← overlap]).
    * Per-round lineage is truncated with localCheckpoint like the
    * other iterative operators (connectedComponents, kmeans).
    *
    * numMerges is small here; a production 32k-merge run amortizes the
    * same plan — the histogram build dominates and runs once.
    *
    * Returns (rank, lhs, rhs, cnt): the ordered merge table, which IS
    * the tokenizer (apply merges in rank order to encode).
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame =
    bpeLoop(df, textCol, numMerges)._1

  /** The trained SEGMENTATION TABLE — how every corpus word tokenizes
    * after `numMerges` merges. This IS the encoder at scale: encoding
    * a corpus is a broadcast join of its words against this table
    * (vocab-sized), never a re-run of the merge scan per document.
    * Returns (word, freq, seg_csv) — the symbol sequence joined with
    * U+241F so the oracle compare is a plain string match.
    */
  def bpeSegmentation(df: DataFrame, textCol: String,
                      numMerges: Int): DataFrame =
    bpeLoop(df, textCol, numMerges)._2
      .select(col("word"), col("freq"),
        array_join(col("seg"), "␟").as("seg_csv"))

  /** Encode the corpus through the trained BPE table: per doc, word
    * count and subword count. The encode itself is the broadcast join
    * this module's docs promise — doc words against the vocab-sized
    * segmentation table — so a 100 TB corpus encodes in one map-side
    * join pass; no per-document merge scanning ever re-runs.
    */
  def bpeEncodeCounts(df: DataFrame, idCol: String, textCol: String,
                      numMerges: Int): DataFrame = {
    val seg = bpeLoop(df, textCol, numMerges)._2
      .select(col("word"), size(col("seg")).cast("long").as("n_sub"))
    val words = df.select(col(idCol),
      explode(Portable.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    words.join(broadcast(seg), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }

  private def bpeLoop(df: DataFrame, textCol: String,
                      numMerges: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val words = df
      .select(explode(Portable.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var seg = words.select(col("word"), col("freq"),
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("seg"))
      .transform(graft.Checkpoints.stabilize)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val top = seg
        .select(col("freq"), explode(zip_with(
          slice(col("seg"), lit(1), size(col("seg")) - 1),
          slice(col("seg"), lit(2), size(col("seg")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((r, a, b, cnt))
        val ab = a + b
        seg = seg.select(col("word"), col("freq"),
          aggregate(col("seg"), typedLit(Seq.empty[String]), (acc, s) =>
            when(size(acc) > 0 &&
              element_at(acc, -1) === lit(a) && s === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(ab))))
              .otherwise(concat(acc, array(s)))).as("seg"))
          .transform(graft.Checkpoints.stabilize)
        r += 1
      }
    }
    import spark.implicits._
    (merges.result().toDF("rank", "lhs", "rhs", "cnt"), seg)
  }

  /** Add-one-smoothed bigram language-model quality score in INTEGER
    * micro-units — the CCNet-style "LM perplexity" filter re-expressed
    * without a single float, so the score is bit-identical on any
    * engine (ln/exp differ in final ulps across engines; integer
    * ratios never do; the RANKING matches a real log-perplexity filter
    * wherever probability ordering agrees, and rank is what the
    * curation gate consumes).
    *
    * Model: p_ppm(cur | prev) = ⌊10⁶ · (c₂(prev,cur)+1) / (c₁(prev)+V)⌋
    * with c₂/c₁ the train-corpus bigram/unigram counts and V its
    * vocabulary size. Doc score: Σ p_ppm over the doc's bigrams (an
    * integer sum — commutative, partition-order-free) plus
    * avg_ppm = sum div n. Higher = more fluent under the train corpus;
    * gate on an avg_ppm band exactly like a perplexity band.
    *
    * Scale shape: ONE zip_with bigram explosion per corpus (no
    * token-pair shuffle — bigrams are built inside the row), two
    * groupBys for the model tables, then the score pass joins bigrams
    * against the model keyed on (prev, cur) — vocabulary²-bounded,
    * corpus-row-bounded in practice — and one integer groupBy per doc.
    * Vocab size rides the plan as a broadcast 1-row aggregate, not a
    * collected scalar. Docs with < 2 tokens have no bigrams and are
    * absent from the output (nothing to score).
    *
    * `train` and `score` may differ (the production shape: train on a
    * clean reference corpus, score the crawl); [[graft.queries
    * .TextQueries]] self-scores for the oracle. Unseen bigrams get the
    * +1 numerator; unseen prev tokens get denominator V.
    */
  def bigramLmScore(train: DataFrame, score: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    def toksOf(df: DataFrame) = df.select(col(idCol),
      filter(Portable.tokens(col(textCol)), t => length(t) > 0).as("__t"))
    def bigramsOf(df: DataFrame) = toksOf(df)
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("__bg"))
      .select(col(idCol), col("__bg.prev").as("prev"), col("__bg.cur").as("cur"))
    val trainToks = toksOf(train).select(explode(col("__t")).as("tok"))
    val c2 = bigramsOf(train).groupBy("prev", "cur")
      .agg(count(lit(1)).as("__c2"))
    val c1 = trainToks.groupBy(col("tok").as("prev"))
      .agg(count(lit(1)).as("__c1"))
    val vocab = trainToks.agg(countDistinct(col("tok")).as("__v"))
    bigramsOf(score)
      .join(c2, Seq("prev", "cur"), "left")
      .join(c1, Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__ppm", expr(
        "(1000000 * (coalesce(__c2, 0) + 1)) div (coalesce(__c1, 0) + __v)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__ppm")).as("sum_ppm"))
      .withColumn("avg_ppm", expr("sum_ppm div n_bigrams"))
  }

  /** CCNet's head/middle/tail split over the LM score: per group
    * (source, language, …), rank docs by [[bigramLmScore]]'s `avg_ppm`
    * (higher = more fluent) and cut the group into `buckets` tiers —
    * bucket 1 is the head (keep), the last is the tail
    * (gibberish/templates, drop or down-weight).
    *
    * Two forms, same contract up to boundary placement:
    *
    *  - DEFAULT (`exactNtile = false`) — the production shape. CCNet
    *    itself cuts on score QUANTILES, so compute per-group cutoffs
    *    with `percentile_approx` (a mergeable GK sketch: partial-agg
    *    combine, bounded memory per group), broadcast the tiny
    *    one-row-per-group cutoff table back, and assign buckets with a
    *    row-local comparison. Zero wide windows — a production crawl
    *    is dominated by one source, and a per-source ntile window
    *    funnels ~the whole corpus through a single task's sort.
    *  - `exactNtile = true` — oracle mode: the original
    *    `ntile(buckets)` window over (avg_ppm DESC, id), an exact
    *    equal-count tiling with engine-portable tie order. Used by the
    *    `q_lm_buckets` oracle for bit-parity with DuckDB's ntile;
    *    confined to catalog-scale inputs.
    *
    * Divergence between the forms is confined to boundaries: the
    * cutoff form puts every doc with the same `avg_ppm` in the same
    * bucket (a doc equal to a cutoff lands in the bucket BELOW it),
    * while ntile splits ties by id to force exact equal counts; bucket
    * boundaries can also shift by ±1 doc where the sketch rank and the
    * ntile boundary disagree. Both keep the invariant that every doc
    * in bucket b scores ≥ every doc in bucket b+1 (up to ties).
    */
  def lmQualityBuckets(train: DataFrame, score: DataFrame, idCol: String,
                       textCol: String, groupCol: String,
                       buckets: Int = 3,
                       exactNtile: Boolean = false): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val scored = bigramLmScore(train, score, idCol, textCol)
      .join(score.select(col(idCol), col(groupCol)), Seq(idCol))
    val bucketed = if (exactNtile) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col("avg_ppm").desc, col(idCol))
      scored.withColumn("bucket", ntile(buckets).over(w))
    } else if (buckets == 1) {
      // one tier = everything is the head; percentile_approx with an
      // empty percentage array fails analysis, so short-circuit
      scored.withColumn("bucket", lit(1))
    } else {
      // descending quantile cutoffs: __cuts[0] ≈ the (1-1/k) quantile
      // (head floor), …, __cuts[k-2] ≈ the 1/k quantile. bucket =
      // 1 + #cutoffs the doc does NOT beat (v ≤ cut → deeper bucket)
      val ps = (1 until buckets).map(b => 1.0 - b.toDouble / buckets)
      val cuts = scored.groupBy(col(groupCol)).agg(
        percentile_approx(col("avg_ppm"),
          array(ps.map(lit(_)): _*), lit(10000)).as("__cuts"))
      scored.join(broadcast(cuts), Seq(groupCol))
        .withColumn("bucket", (lit(1) +
          size(filter(col("__cuts"), c => col("avg_ppm") <= c))).cast("int"))
    }
    bucketed.select(col(idCol), col(groupCol), col("n_bigrams"),
      col("avg_ppm"), col("bucket"))
  }

  // ---- driver-local training twin -----------------------------------
  //
  // [[bpeLoop]] runs one full pair-count shuffle + a 1-row collect PER
  // MERGE — fine for the oracle's 8 rounds, but a production 32–50 k
  // merge vocabulary would mean ~10⁵ sequential Spark jobs. The scale
  // observation: after the histogram groupBy the working set is
  // VOCABULARY-sized (distinct words), no longer corpus-sized — small
  // enough to collect once. So the production path collects the (word,
  // freq) histogram in ONE job, trains every merge round driver-local
  // with incrementally-maintained pair counts (only words containing
  // the merged pair are touched per round), and hands the finished
  // merge/segmentation table back as a broadcast-joinable DataFrame.
  // 100 TB of text still flows through exactly two distributed passes
  // (histogram build, encode join); the merge LOOP costs zero Spark
  // jobs. The distributed loop above stays as the oracle/cross-check
  // mode — BpeLocalSpec pins the two bit-equal.

  /** Spark string ordering is UTF8String binary order: unsigned
    * byte-wise UTF-8 comparison. Java's String.compareTo differs on
    * supplementary characters, so tie-breaks go through this.
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** Greedy left-to-right merge application — the imperative twin of
    * the `aggregate` fold in [[bpeLoop]] (a merged token is strictly
    * longer than its left part, so a fresh merge is never re-merged).
    */
  private def applyMerge(seg: Array[String], a: String, b: String,
                         ab: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](seg.length)
    var i = 0
    while (i < seg.length) {
      if (i + 1 < seg.length && seg(i) == a && seg(i + 1) == b) {
        out += ab; i += 2
      } else { out += seg(i); i += 1 }
    }
    out.toArray
  }

  /** Bookkeeping counters from one [[bpeMergeLoop]] run. BpeLocalSpec
    * gates on these — work done is deterministic for a fixed corpus,
    * while wall-clock is not (the round-5 verdict measured the same
    * 1000-merge train at 56 s and 258 s under different 32-suite
    * contention, flipping the suite red on scheduler luck).
    */
  private[operators] final case class BpeTrainStats(
      vocabWords: Int, initialPairs: Long, pairUpdates: Long,
      heapPushes: Long, heapPops: Long)

  /** The ONE distributed job of the local trainer: corpus → (word,
    * freq) histogram, collected to the driver.
    *
    * The collect is CAPPED, not open-ended: `minFreq` drops words
    * rarer than the floor and `maxVocab` keeps only the top-N words by
    * (freq desc, word) — both applied Spark-side, before the collect.
    * A 100 TB web crawl's distinct-token count (typos, URLs, unicode
    * junk) reaches 10⁸; "vocabulary-sized" is only a safe collect with
    * a floor or cap in place. Contract: training with a floor/cap is
    * BPE over the surviving vocabulary only — identical to training on
    * a corpus restricted to those words (merge statistics never see
    * the dropped tail, which is standard practice: rare words
    * contribute noise, not merges). Defaults (1, MaxValue) keep the
    * spec-pinned bit-equality with the distributed loop.
    */
  private[operators] def bpeHistogram(df: DataFrame, textCol: String,
                                      minFreq: Long = 1L,
                                      maxVocab: Int = Int.MaxValue)
      : Array[(String, Long)] = {
    val base = df
      .select(explode(Portable.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val floored = if (minFreq > 1L) base.filter(col("freq") >= minFreq)
                  else base
    val capped = if (maxVocab != Int.MaxValue)
      floored.orderBy(col("freq").desc, col("word")).limit(maxVocab)
    else floored
    capped.collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** Driver-local merge loop over a collected histogram. Pure driver
    * code — no SparkSession in scope, so "the merge loop runs zero
    * Spark jobs" holds by construction (BpeLocalSpec also asserts it
    * through a job group).
    *
    * Argmax is a lazy-deletion max-heap over (cnt desc, lhs, rhs) —
    * lhs/rhs in UTF-8 byte order, identical to the distributed
    * orderBy(desc(cnt), a, b). Every count change pushes a fresh
    * entry; pops discard entries whose recorded cnt no longer matches
    * the live count. O(log P) per merge instead of the previous O(P)
    * full-map scan — at a real 32–50 k-merge vocabulary that is the
    * difference between ~10⁸ tuple comparisons and ~10⁶ heap ops.
    */
  private[operators] def bpeMergeLoop(hist: Array[(String, Long)],
                                      numMerges: Int)
      : (Seq[(Int, String, String, Long)], Array[Array[String]], BpeTrainStats) = {
    import scala.collection.mutable
    val segs: Array[Array[String]] =
      hist.map { case (w, _) => w.map(_.toString).toArray }
    val freqs: Array[Long] = hist.map(_._2)
    // pair → total weighted count; pair → word indices containing it
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    var pairUpdates = 0L
    var heapPushes = 0L
    var heapPops = 0L
    final case class Entry(a: String, b: String, cnt: Long)
    // max-heap: higher cnt wins; ties prefer the UTF-8-smaller lhs,
    // then rhs (so "better" compares as LARGER here)
    val ord: Ordering[Entry] = (x: Entry, y: Entry) =>
      if (x.cnt != y.cnt) java.lang.Long.compare(x.cnt, y.cnt)
      else if (x.a != y.a) { if (utf8Lt(x.a, y.a)) 1 else -1 }
      else if (x.b != y.b) { if (utf8Lt(x.b, y.b)) 1 else -1 }
      else 0
    val heap = mutable.PriorityQueue.empty[Entry](ord)
    def push(a: String, b: String, c: Long): Unit = {
      heap.enqueue(Entry(a, b, c)); heapPushes += 1
    }
    // pairs whose live count changed during the current merge round —
    // pushed ONCE with their final count after the round, not once per
    // touched word (a hot pair is updated by thousands of words per
    // round; per-update pushes would make the lazy heap the bottleneck)
    val dirty = mutable.HashSet.empty[(String, String)]
    def addWord(i: Int, sign: Long, record: Boolean): Unit = {
      val s = segs(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(i)
        pairUpdates += 1
        if (c == 0L) { counts.remove(p); where.get(p).foreach(_.remove(i)) }
        else {
          counts(p) = c
          if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        if (record) dirty += p
        j += 1
      }
    }
    // initial build: counts first, then heapify each distinct pair once
    segs.indices.foreach(addWord(_, 1L, record = false))
    val initialPairs = pairUpdates
    counts.foreach { case ((a, b), c) => push(a, b, c) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      // pop until an entry matches its pair's live count (valid) or
      // the heap drains (no pairs left — documented stop condition).
      // Valid-pop correctness: every live pair's latest count was
      // pushed when it last changed (end of the round below), so the
      // first matching entry IS the max under ord
      var best: Entry = null
      while (best == null && heap.nonEmpty) {
        val e = heap.dequeue(); heapPops += 1
        if (counts.getOrElse((e.a, e.b), 0L) == e.cnt) best = e
      }
      if (best == null) exhausted = true
      else {
        val Entry(a, b, cnt) = best
        merges += ((r, a, b, cnt))
        val ab = a + b
        // only words containing (a,b) change; retract their old pairs,
        // re-add after the merge
        val touched = where.getOrElse((a, b), mutable.Set.empty).toArray
        dirty.clear()
        touched.foreach { i =>
          addWord(i, -1L, record = true)
          segs(i) = applyMerge(segs(i), a, b, ab)
          addWord(i, 1L, record = true)
        }
        dirty.foreach { p =>
          counts.get(p).foreach(c => push(p._1, p._2, c))
        }
        r += 1
      }
    }
    (merges.result(), segs,
      BpeTrainStats(hist.length, initialPairs, pairUpdates, heapPushes,
        heapPops))
  }

  private def bpeLocalLoop(df: DataFrame, textCol: String, numMerges: Int,
                           minFreq: Long = 1L, maxVocab: Int = Int.MaxValue)
      : (Seq[(Int, String, String, Long)], Array[(String, Long, Array[String])]) = {
    val hist = bpeHistogram(df, textCol, minFreq, maxVocab)
    val (merges, segs, _) = bpeMergeLoop(hist, numMerges)
    (merges, hist.indices.map(i => (hist(i)._1, hist(i)._2, segs(i))).toArray)
  }

  /** Driver-local twin of [[bpeTrain]] — identical merge table (pinned
    * by BpeLocalSpec), one Spark job total. The production trainer.
    *
    * `minFreq` / `maxVocab` bound the histogram collect (see
    * [[bpeHistogram]] for the contract). DEFAULTS ARE BOUNDED
    * (minFreq = 2, maxVocab = 1,000,000 — r13-advice hardening): the
    * driver heap stays ≤ ~10⁶ short strings no matter the corpus,
    * because a 100 TB crawl's distinct-token tail (typos, URLs,
    * unicode junk, ~10⁸ words) is dropped Spark-side before the
    * collect — standard BPE practice, rare words contribute noise,
    * not merges. The unbounded form is the EXPLICITLY-NAMED oracle
    * path, [[bpeTrainExact]]; no public entry collects an unbounded
    * histogram by default.
    */
  def bpeTrainLocal(df: DataFrame, textCol: String, numMerges: Int,
                    minFreq: Long = 2L,
                    maxVocab: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeLocalLoop(df, textCol, numMerges, minFreq, maxVocab)._1
      .toDF("rank", "lhs", "rhs", "cnt")
  }

  /** The UNBOUNDED oracle path: full-vocabulary training, bit-equal to
    * the distributed loop (BpeLocalSpec) and to the DuckDB replay —
    * reach for it by NAME, never by default (the histogram collect is
    * corpus-vocabulary-sized).
    */
  def bpeTrainExact(df: DataFrame, textCol: String,
                    numMerges: Int): DataFrame =
    bpeTrainLocal(df, textCol, numMerges, minFreq = 1L,
      maxVocab = Int.MaxValue)

  /** GUARDED trainer kept for callers that want the bound REQUIRED,
    * not merely defaulted: rejects an unbounded cap outright.
    * Since the r14 default flip, [[bpeTrainLocal]]'s own defaults are
    * already the production bounds.
    */
  def bpeTrainProduction(df: DataFrame, textCol: String, numMerges: Int,
                         minFreq: Long = 2L,
                         maxVocab: Int = 1000000): DataFrame = {
    require(maxVocab > 0 && maxVocab != Int.MaxValue,
      "bpeTrainProduction requires a real vocab cap; " +
        "use bpeTrainExact explicitly for an unbounded collect")
    require(minFreq >= 1L, s"minFreq must be >= 1, got $minFreq")
    bpeTrainLocal(df, textCol, numMerges, minFreq, maxVocab)
  }

  /** Driver-local twin of [[bpeSegmentation]] — same (word, freq,
    * seg_csv) table, zero per-round Spark jobs. With a floor/cap the
    * table covers the surviving vocabulary only ([[bpeHistogram]]).
    * Bounded defaults; [[bpeSegmentationExact]] is the oracle path.
    */
  def bpeSegmentationLocal(df: DataFrame, textCol: String, numMerges: Int,
                           minFreq: Long = 2L,
                           maxVocab: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeLocalLoop(df, textCol, numMerges, minFreq, maxVocab)._2.toSeq
      .map { case (w, f, s) => (w, f, s.mkString("␟")) }
      .toDF("word", "freq", "seg_csv")
  }

  /** Unbounded [[bpeSegmentationLocal]] — full-vocabulary oracle path,
    * by name only.
    */
  def bpeSegmentationExact(df: DataFrame, textCol: String,
                           numMerges: Int): DataFrame =
    bpeSegmentationLocal(df, textCol, numMerges, minFreq = 1L,
      maxVocab = Int.MaxValue)

  /** Driver-local twin of [[bpeEncodeCounts]]: train locally, then the
    * ENCODE stays fully distributed — corpus words broadcast-joined
    * against the vocab-sized segmentation table, one map-side pass.
    * With a floor/cap, words outside the surviving vocabulary drop out
    * of the encode join (they have no segmentation). Bounded defaults;
    * [[bpeEncodeCountsExact]] is the full-coverage oracle path.
    */
  /** Unbounded [[bpeEncodeCountsLocal]] — full-coverage oracle path,
    * by name only.
    */
  def bpeEncodeCountsExact(df: DataFrame, idCol: String, textCol: String,
                           numMerges: Int): DataFrame =
    bpeEncodeCountsLocal(df, idCol, textCol, numMerges, minFreq = 1L,
      maxVocab = Int.MaxValue)

  def bpeEncodeCountsLocal(df: DataFrame, idCol: String, textCol: String,
                           numMerges: Int, minFreq: Long = 2L,
                           maxVocab: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val seg = bpeLocalLoop(df, textCol, numMerges, minFreq, maxVocab)._2.toSeq
      .map { case (w, _, s) => (w, s.length.toLong) }
      .toDF("word", "n_sub")
    val words = df.select(col(idCol),
      explode(Portable.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    words.join(broadcast(seg), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }

  /** Tokenizer fertility report: per group (source), the ratio of BPE
    * subword tokens to whitespace words under the corpus-trained merge
    * table — the metric that tells a pipeline which sources the
    * tokenizer serves poorly (fertility ≫ 1 means the vocab fragments
    * that source's text, inflating training cost per useful byte).
    *
    * Rides [[bpeEncodeCountsLocal]]'s broadcast segment table; the
    * only additional work is one group-keyed aggregate of two longs.
    * Bounded histogram defaults (the r14 flip); pass (1, Int.MaxValue)
    * explicitly for the full-vocabulary oracle form.
    */
  def bpeFertility(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, numMerges: Int,
                   minFreq: Long = 2L, maxVocab: Int = 1000000): DataFrame = {
    val counts = bpeEncodeCountsLocal(df, idCol, textCol, numMerges,
      minFreq, maxVocab)
    df.select(col(idCol), col(groupCol)).join(counts, idCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words"), 6))
  }

  /** Per-group top-k characteristic terms by a LOG-FREE tf-idf score:
    * score = tf × N / df (tf = term count within the group, df =
    * distinct docs containing the term, N = corpus doc count). The
    * log is deliberately absent — ln() differs in final ulps across
    * engines, while ×/÷ of doubles is IEEE-exact, so the DuckDB
    * oracle hash-matches bit-for-bit; the RANKING is identical to
    * classic tf-idf whenever df ordering agrees, and rank is what the
    * report consumes.
    *
    * Plan: ONE token explosion aggregated to (group, tok, doc, c) —
    * map-side combined, then localCheckpoint'ed because both tf and
    * df derive from it (tf = Σc per group×tok; df = distinct docs per
    * tok). The checkpointed frame is bounded by distinct tokens per
    * doc, far smaller than the raw token stream. Ranking is
    * row_number over (group, score desc, tok) — the GroupedTopK heap
    * operator picks it up (string partition key), so no per-group
    * sort materializes.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               groupCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), col(groupCol),
      explode(Portable.tokens(col(textCol))).as("tok"))
    val g1 = toks.groupBy(col(groupCol), col("tok"), col(idCol))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val tf = g1.groupBy(col(groupCol), col("tok")).agg(sum("__c").as("tf"))
    val dfreq = g1.select(col("tok"), col(idCol)).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") * col("__n") / col("df"), 6))
      .drop("__n")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(groupCol), col("tok"), col("tf"), col("df"),
        col("score"), col("rk"))
  }

  // ---- maintained tf-idf term statistics ----
  //
  // The stored twin of [[topTerms]]: the characteristic-terms report
  // derives entirely from three additive aggregates — tf per (group,
  // term), df per term (one contribution per distinct (doc, term)),
  // and the corpus doc count — so the WHOLE state is maintainable by
  // pure arithmetic under inserts AND deletes (every doc's
  // contribution is recomputable from the doc alone; removal
  // subtracts exactly what insertion added). No dirty-group recompute
  // exists in this lifecycle at all. State lives as three
  // [[graft.io.MaintainedAgg]] views (hash-partitioned, PartCommit
  // exactly-once, batch-id replay no-ops), so a CDC batch touches
  // O(batch terms / 64) of the stored statistics and the serve reads
  // the views, never the corpus. Refresh ≡ [[topTerms]] over the new
  // snapshot is the oracle (q_incr_tfidf).

  /** Per-doc term contributions — [[topTerms]]'s g1 frame: one row
    * per (group, tok, doc) carrying the in-doc count as `tf`. Both
    * the bootstrap and every CDC batch derive their view deltas from
    * exactly this shape, which is what makes remove ≡ −insert exact.
    */
  private def termContribs(df: DataFrame, idCol: String, textCol: String,
                           groupCol: String): DataFrame =
    df.select(col(idCol), col(groupCol),
      explode(Portable.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Bootstrap the maintained term statistics under `dir`:
    * `dir/tf` (group, tok → Σtf), `dir/df` (tok → contributing docs),
    * `dir/n` (corpus doc count).
    */
  def writeTermStats(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, dir: String): Unit = {
    val spark = df.sparkSession
    // ONE tokenize pass, NOTHING corpus-sized staged: the tf view is
    // the only consumer that needs the (group, tok, doc) contributions,
    // because df(tok) folds from the AGGREGATED tf view — every doc
    // carries exactly one group, so the number of docs containing tok
    // is Σ_group n_docs(group, tok) — and the corpus count comes
    // straight from the doc frame (no tokenize). This replaces a
    // corpus-sized contribution stage (first a lineage-truncating
    // localCheckpoint — r14 verdict #3 — then a recoverable-but-heavy
    // parquet stage) with plain recomputable lineage: the contribution
    // set is never written at all, and the df build scans the already
    // term-aggregated view, orders of magnitude smaller than the
    // per-doc contributions at corpus scale.
    // the tf→df chain is dependent (df folds from the written tf
    // view); the corpus-count view is independent of both and overlaps
    // them (guide §2.6) — its tiny count job back-fills the tf write's
    // straggler tail
    parallel2(
      () => {
        graft.io.MaintainedAgg.write(
          termContribs(df, idCol, textCol, groupCol)
            .groupBy(col(groupCol), col("tok"))
            .agg(sum(col("tf")).as("tf"), count(lit(1)).as("n_docs")),
          Seq(groupCol, "tok"), s"$dir/tf", Seq("tf"), "n_docs")
        graft.io.MaintainedAgg.write(
          graft.io.MaintainedAgg.read(spark, s"$dir/tf")
            .groupBy(col("tok")).agg(sum(col("n_docs")).as("df")),
          Seq("tok"), s"$dir/df", Seq.empty, "df")
      },
      () => graft.io.MaintainedAgg.write(
        df.select(lit("corpus").as("scope"))
          .groupBy(col("scope")).agg(count(lit(1)).as("n_docs")),
        Seq("scope"), s"$dir/n", Seq.empty, "n_docs"))
    ()
  }

  /** Apply a CDC doc batch to the stored term statistics.
    * `removedDocs` / `addedDocs` carry FULL doc rows (id, text,
    * group) — a doc update contributes its old row to removed and
    * its new row to added. All three views fold arithmetically;
    * exactly-once under retry keyed by `batchId`.
    */
  def refreshTermStats(spark: SparkSession, dir: String,
                       removedDocs: DataFrame, addedDocs: DataFrame,
                       idCol: String, textCol: String, groupCol: String,
                       batchId: Long): Unit = {
    // The three views are INDEPENDENT tables (own dirs, own PartCommit
    // marks), and rem/add are two independent tokenize jobs — actions
    // were only sequential because this driver code called them
    // sequentially (guide §2.6: overlap independent jobs; Spark's
    // scheduler back-fills one job's straggler tail with the next
    // job's tasks). Crash story unchanged: a crash mid-way leaves some
    // tables applied and some not, exactly like the sequential form —
    // a replay with the same batchId no-ops on the applied ones and
    // completes the rest (each table's exactly-once is its own mark).
    val (rem, add) = parallel2(
      () => termContribs(removedDocs, idCol, textCol, groupCol)
        .localCheckpoint(),
      () => termContribs(addedDocs, idCol, textCol, groupCol)
        .localCheckpoint())
    parallel3(
      () => graft.io.MaintainedAgg.deltaRefresh(spark, s"$dir/tf",
        rem, add, Seq(groupCol, "tok"), Seq("tf"), "n_docs", batchId),
      () => graft.io.MaintainedAgg.deltaRefresh(spark, s"$dir/df",
        rem.select(col("tok")), add.select(col("tok")),
        Seq("tok"), Seq.empty, "df", batchId),
      () => graft.io.MaintainedAgg.deltaRefresh(spark, s"$dir/n",
        removedDocs.select(lit("corpus").as("scope")),
        addedDocs.select(lit("corpus").as("scope")),
        Seq("scope"), Seq.empty, "n_docs", batchId))
  }

  private def parallel2[A, B](fa: () => A, fb: () => B): (A, B) =
    graft.Par.par2(fa, fb)

  private def parallel3(fs: (() => Unit)*): Unit =
    graft.Par.par3(fs: _*)

  /** Serve the characteristic-terms report FROM THE STORED STATE —
    * the [[topTerms]] output shape and the exact same ×/÷-only score
    * arithmetic (tf cast long→double, × N, ÷ df), so serve ≡ topTerms
    * over the snapshot the state reflects, bit-for-bit. Reads three
    * views; never touches a document.
    */
  def topTermsFromStats(spark: SparkSession, dir: String,
                        groupCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.io.MaintainedAgg.read(spark, s"$dir/tf")
      .select(col(groupCol), col("tok"), col("tf").cast("long").as("tf"))
    val dfreq = graft.io.MaintainedAgg.read(spark, s"$dir/df")
      .select(col("tok"), col("df"))
    val n = graft.io.MaintainedAgg.read(spark, s"$dir/n")
      .select(col("n_docs").as("__n"))
    val scored = tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") * col("__n") / col("df"), 6))
      .drop("__n")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(groupCol), col("tok"), col("tf"), col("df"),
        col("score"), col("rk"))
  }

  // ---- streaming twin of the term statistics ----
  //
  // All three views are MaintainedAgg sums, so the shared delta
  // protocol ([[graft.io.Deltas]]) applies verbatim: each micro-batch
  // of NEW docs lands one delta per view under the batch's own
  // partition (replay rewrites the same bytes), serving is
  // merge-on-read, compaction folds atomically. Deletes stay on the
  // CDC path ([[refreshTermStats]]) and require COMPACTING FIRST,
  // like every maintained view: even pure sums cannot compose a
  // delete with a pending delta, because the base-side count>0 clamp
  // drops a group whose contributions still sit in an unfolded delta
  // batch, losing the subtraction (MaintainedAgg.deltaRefresh
  // enforces this with a fail-fast guard).

  /** One micro-batch of NEW docs: append its term-stat deltas to all
    * three views. Replay-idempotent per view (own-partition overwrite
    * + the `_folded` mark).
    */
  def writeTermStatsDeltaPartial(addedDocs: DataFrame, batchId: Long,
                                 idCol: String, textCol: String,
                                 groupCol: String, dir: String): Unit = {
    val docs = addedDocs.localCheckpoint() // contribs + N: two reads
    val add = termContribs(docs, idCol, textCol, groupCol)
      .localCheckpoint() // tf delta + df delta: two more
    graft.io.MaintainedAgg.writeDeltaPartial(add, batchId,
      Seq(groupCol, "tok"), Seq("tf"), "n_docs", s"$dir/tf")
    graft.io.MaintainedAgg.writeDeltaPartial(add.select(col("tok")),
      batchId, Seq("tok"), Seq.empty, "df", s"$dir/df")
    graft.io.MaintainedAgg.writeDeltaPartial(
      docs.select(lit("corpus").as("scope")), batchId,
      Seq("scope"), Seq.empty, "n_docs", s"$dir/n")
  }

  /** Serve the report over base ⊎ pending deltas — the
    * [[topTermsFromStats]] arithmetic over merge-on-read views.
    */
  def topTermsWithDeltas(spark: SparkSession, dir: String,
                         groupCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.io.MaintainedAgg.readWithDeltas(spark, s"$dir/tf",
      Seq(groupCol, "tok"), Seq("tf"), "n_docs")
      .select(col(groupCol), col("tok"), col("tf").cast("long").as("tf"))
    val dfreq = graft.io.MaintainedAgg.readWithDeltas(spark, s"$dir/df",
      Seq("tok"), Seq.empty, "df")
      .select(col("tok"), col("df"))
    val n = graft.io.MaintainedAgg.readWithDeltas(spark, s"$dir/n",
      Seq("scope"), Seq.empty, "n_docs")
      .select(col("n_docs").as("__n"))
    val scored = tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") * col("__n") / col("df"), 6))
      .drop("__n")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(groupCol), col("tok"), col("tf"), col("df"),
        col("score"), col("rk"))
  }

  /** Fold pending deltas into all three views atomically (per view —
    * the usual single-writer discipline: stop the ingest first).
    */
  def compactTermStats(spark: SparkSession, dir: String,
                       groupCol: String): Unit = {
    graft.io.MaintainedAgg.compactDeltas(spark, s"$dir/tf",
      Seq(groupCol, "tok"), Seq("tf"), "n_docs")
    graft.io.MaintainedAgg.compactDeltas(spark, s"$dir/df",
      Seq("tok"), Seq.empty, "df")
    graft.io.MaintainedAgg.compactDeltas(spark, s"$dir/n",
      Seq("scope"), Seq.empty, "n_docs")
  }

  /** PMI collocation mining: the corpus-wide top-k adjacent bigrams
    * by pointwise mutual information — the phrase-mining primitive
    * that finds multi-word expressions ("hash join", "new york")
    * worth treating as single tokens downstream.
    *
    * Score = n_pair·N²/(M·c_left·c_right), the monotone argument of
    * PMI (log omitted — it can't change the ranking and ln ulps
    * differ across engines); ×/÷ in one fixed left-associated order
    * so the oracle's doubles are bit-identical before the round. A
    * min-count floor kills the hapax pairs PMI notoriously inflates.
    *
    * Scale shape: unigram and bigram counts are token-keyed groupBys
    * with map-side combine; the scoring joins are vocabulary-keyed;
    * the two corpus totals are one-row broadcasts. The global top-k
    * is TakeOrdered (a k-row driver heap), and the final rank window
    * runs over those ≤k rows only — never a corpus-wide sort.
    */
  def collocationsPmi(df: DataFrame, idCol: String, textCol: String,
                      minPair: Long = 5L, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksDf = df.select(col(idCol),
      Portable.tokens(col(textCol)).as("__toks"))
      .localCheckpoint() // feeds unigrams, bigrams, and both totals
    val uni = toksDf.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
      .localCheckpoint() // joined twice (left and right member)
    val nTok = uni.agg(sum(col("__c")).as("__n"))
    val m = toksDf
      .select(when(size(col("__toks")) > 1, size(col("__toks")) - 1)
        .otherwise(0).cast("long").as("__b"))
      .agg(sum(col("__b")).as("__m"))
    val pairs = toksDf
      .select(explode(Portable.shingles(col("__toks"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
    val scored = pairs
      .withColumn("__lt", substring_index(col("bigram"), " ", 1))
      .withColumn("__rt", substring_index(col("bigram"), " ", -1))
      .join(uni.select(col("tok").as("__lt"), col("__c").as("n_left")), "__lt")
      .join(uni.select(col("tok").as("__rt"), col("__c").as("n_right")), "__rt")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(m))
      .withColumn("score",
        round(col("n_pair").cast("double") * col("__n") * col("__n")
          / (col("n_left") * col("n_right")) / col("__m"), 6))
    val top = scored
      .orderBy(col("score").desc, col("bigram").asc).limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("score").desc, col("bigram").asc)))
      .select(col("rk"), col("bigram"), col("n_pair"), col("n_left"),
        col("n_right"), col("score"))
  }

  /** Per-document keyword extraction: each doc's top-k terms by the
    * same log-free tf·idf rational [[topTerms]] ranks with — the
    * doc-level tagging pass (search snippets, dataset cards, topic
    * labels) where topTerms is the corpus-level profile.
    *
    * Scale shape: one token explosion aggregated to (doc, tok, tf) —
    * map-side combined and checkpointed because df derives from the
    * same frame; the idf join is vocabulary-keyed; the corpus size is
    * a one-row broadcast. Ranking is row_number over (doc, score
    * desc, tok) — doc-partitioned, so the GroupedTopK heap operator
    * applies and no global sort exists anywhere.
    */
  def docKeywords(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol),
      explode(Portable.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds both tf and df
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("tok").asc)
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") * col("__n") / col("df"), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("tok"), col("tf"), col("df"),
        col("score"))
  }

  /** Inverted-index build: token → document frequency + a bounded,
    * sorted posting sample (first `maxPostings` doc ids as a CSV
    * string). The full posting list of a stopword-like token is the
    * classic reducer-killer; the bound keeps every group's state
    * O(maxPostings) while `doc_freq` stays exact. One explode + one
    * groupBy on the token — shuffle carries (token, id) pairs,
    * pre-deduped per doc so a token repeated in a doc ships once.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 20): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(Portable.tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"),
        array_join(
          slice(array_sort(collect_list(col(idCol))), 1, maxPostings),
          ",").as("postings"))

  /** Boilerplate REMOVAL — the C4-style cleanup a pipeline actually
    * runs after [[boilerplateNgrams]] detection: every occurrence of a
    * corpus-frequent k-shingle is removed from the text (token spans
    * covered by at least one boilerplate shingle occurrence are cut,
    * survivors re-joined in order). Returns (idCol, text_clean) for
    * EVERY input doc — a fully-boilerplate doc comes back as "".
    *
    * Plan shape: one token-array projection feeds both the position-
    * indexed token table and the position-indexed shingle table
    * (posexplode each); boilerplate hits are a shingle-key join against
    * the detection output (shuffle carries shingles, never docs²);
    * coverage expands hits by k positions; a (id, pos) anti-join drops
    * covered tokens; one groupBy per doc rebuilds the text. Every
    * shuffle is keyed on doc id or shingle — corpus-scale safe.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, minDocs: Long = 5): DataFrame = {
    val bp = boilerplateNgrams(df, idCol, textCol, k, minDocs)
      .select(col("shingle"))
    val base = df.select(col(idCol), Portable.tokens(col(textCol)).as("__toks"))
    val toks = base.select(col(idCol),
      posexplode(col("__toks")).as(Seq("pos", "tok")))
    val grams = base.select(col(idCol),
      posexplode(Portable.shingles(col("__toks"), k)).as(Seq("start", "shingle")))
    val covered = grams.join(bp, "shingle")
      .select(col(idCol),
        explode(sequence(col("start"), col("start") + (k - 1))).as("pos"))
      .distinct()
    val rebuilt = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("text_clean"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .withColumn("text_clean", coalesce(col("text_clean"), lit("")))
  }

  /** DuckDB SQL mirror of [[fingerprint]] over a text expression. */
  def fingerprintSql(textE: String): String = {
    val toks = Portable.tokensSql(textE)
    val hs = s"list_transform($toks, x -> ${Portable.hash32Sql("x")})"
    s"CASE WHEN trim($textE) = '' OR len($hs) = 0 THEN -1 ELSE " +
      s"list_reduce($hs, (acc, x) -> (acc * 31 + x) % ${Portable.P}) END"
  }
}
