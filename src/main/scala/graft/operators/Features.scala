package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group numeric feature transforms for model-input preparation:
  * standardization and outlier clipping. Both follow the same scale
  * shape — ONE aggregate over the fact table producing a small
  * per-group stats frame joined back onto the facts — so the
  * fact table is scanned twice but never shuffled on its own rows
  * (the alternative, a window over the group, shuffles and buffers
  * every fact row).
  *
  * The stats join deliberately carries NO `broadcast()` hint: a hint
  * overrides Spark's size check, so at millions of groups it would OOM
  * the driver instead of degrading. With AQE on (pinned in
  * [[graft.Sessions]]) the runtime sees the stats frame's TRUE
  * post-aggregation size and picks broadcast when it fits,
  * shuffle-hash/sort-merge when it doesn't — FeaturesSpec pins both
  * behaviors (broadcast chosen at default thresholds; identical
  * results with broadcast disabled).
  */
object Features {

  /** z-score standardization within each group:
    * (x − mean) / stddev_samp. A constant-valued group has stddev 0 →
    * null z-score (try_divide), which is the honest answer. Rounded to
    * 6 decimals so results are stable across partition-order float
    * summation.
    *
    * NULL group keys form their own group (groupBy keeps them) and are
    * re-attached with null-safe equality — a plain equi-join would
    * silently drop every null-group row from the output.
    */
  def zscoreByGroup(df: DataFrame, valueCol: String, groupCol: String)
      : DataFrame = {
    val stats = df.groupBy(col(groupCol).as("__grp"))
      .agg(avg(col(valueCol)).as("__mu"),
        stddev_samp(col(valueCol)).as("__sd"))
    df.join(stats, col(groupCol) <=> col("__grp"))
      .withColumn("zscore",
        round(try_divide(col(valueCol) - col("__mu"), col("__sd")), 6))
      .drop("__grp", "__mu", "__sd")
  }

  /** Fixed-bound equi-width histogram per group: bucket =
    * clamp(floor((x − lo)/width), 0, n−1), counted per (group,
    * bucket). One aggregation, no window, sparse output (empty buckets
    * absent). Fixed [lo, hi) rather than data-driven bounds keeps it
    * ONE pass and deterministic — the profiling default at corpus
    * scale, where a min/max pre-pass doubles the scan; compose with
    * [[winsorizeByGroup]]'s percentile frame when adaptive bounds are
    * worth the second pass.
    */
  def histogram(df: DataFrame, valueCol: String, groupCol: String,
                lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val bucket = least(greatest(
      floor((col(valueCol) - lo) / width), lit(0.0)), lit(nBuckets - 1.0))
      .cast("int")
    // least/greatest SKIP nulls: an unfiltered NULL would count into
    // bucket 0 and NaN (sorting largest) into the top bucket — a
    // histogram counts observed values only
    df.filter(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .withColumn("bucket", bucket)
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", round(lit(lo) + col("bucket") * width, 6))
      .withColumn("bucket_hi", round(lit(lo) + (col("bucket") + 1) * width, 6))
  }

  /** Pairwise Pearson correlation between per-entity activity counts
    * of every type pair — "do users who click also buy?" across the
    * whole type matrix. Built from INTEGER sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy² over the dense entity×type count
    * matrix), so the accumulation is order-free and engine-exact; the
    * closing formula is a fixed-order double expression (sqrt is
    * IEEE-correctly-rounded on both engines). Spark's builtin `corr`
    * is a float accumulator whose partition order leaks into the
    * result — this one is reproducible bit-for-bit.
    *
    * Scale shape: one (entity, type) count aggregate; the dense
    * matrix is counts left-joined onto entity-spine × type-list
    * (types are enumerable — the list frame broadcasts); the pair
    * self-join is entity-keyed with ≤T fan-out per side; the final
    * frame is one row per type pair. Zero-variance types yield null r
    * (try_divide), the honest answer.
    */
  def pairwiseCorrelation(df: DataFrame, entityCol: String,
                          typeCol: String): DataFrame = {
    val counts = df.groupBy(col(entityCol).as("__e"), col(typeCol).as("__t"))
      .agg(count(lit(1)).as("__n"))
    val entities = df.select(col(entityCol).as("__e")).distinct()
    val types = df.select(col(typeCol).as("__t")).distinct()
    val dense = entities.crossJoin(broadcast(types))
      .join(counts, Seq("__e", "__t"), "left")
      .select(col("__e"), col("__t"), coalesce(col("__n"), lit(0L)).as("__n"))
    val pairs = dense.select(col("__e"), col("__t").as("type_a"),
        col("__n").as("__x"))
      .join(dense.select(col("__e"), col("__t").as("type_b"),
        col("__n").as("__y")), "__e")
      .filter(col("type_a") < col("type_b"))
    // accumulate in decimal(38,0) (HUGEINT on the oracle side): the
    // per-pair Σx·y over corpus-scale counts wraps a long silently,
    // and the closing-product double cast can only be as good as the
    // sums it consumes
    def d38(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    pairs.groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n"),
        sum(d38(col("__x"))).as("__sx"), sum(d38(col("__y"))).as("__sy"),
        sum(d38(col("__x")) * col("__y")).as("__sxy"),
        sum(d38(col("__x")) * col("__x")).as("__sxx"),
        sum(d38(col("__y")) * col("__y")).as("__syy"))
      // cast each sufficient statistic to double BEFORE the products:
      // long products (n*sxy, sx*sy, ...) silently wrap at corpus scale
      // while DuckDB widens to HUGEINT — double keeps both engines on
      // identical IEEE arithmetic
      .withColumn("r", round(try_divide(
        col("n").cast("double") * col("__sxy").cast("double")
          - col("__sx").cast("double") * col("__sy").cast("double"),
        sqrt(col("n").cast("double") * col("__sxx").cast("double")
          - col("__sx").cast("double") * col("__sx").cast("double")) *
          sqrt(col("n").cast("double") * col("__syy").cast("double")
            - col("__sy").cast("double") * col("__sy").cast("double"))), 6))
      .select(col("type_a"), col("type_b"), col("n"), col("r"))
  }

  /** Cross-group quantile normalization: map each row's value to its
    * percentile WITHIN its group via a fixed grid of exact per-group
    * percentile cutoffs — the calibration that makes a quality score
    * comparable across sources whose raw distributions differ (CCNet
    * thresholds per source for exactly this reason). Output percentile
    * is a multiple of 100/gridSize.
    *
    * Scale shape: ONE percentile aggregate produces a groups×1 frame
    * whose cutoff ARRAY rides the stats join (AQE broadcasts it);
    * assignment is a row-local filter over ≤gridSize array elements —
    * never a per-group window sort over the facts (the ntile
    * formulation this replaces buffers every fact row per group).
    * Cutoffs are pre-rounded to 6 decimals so the `<=` compares the
    * same decimals on both engines.
    */
  def quantileNormalize(df: DataFrame, valueCol: String, groupCol: String,
                        gridSize: Int = 20): DataFrame = {
    require(gridSize >= 2 && 100 % gridSize == 0,
      "gridSize must divide 100")
    val ps = (1 until gridSize).map(i =>
      (i.toDouble / gridSize).toString).mkString(", ")
    val cuts = df.groupBy(col(groupCol).as("__g"))
      .agg(expr(s"percentile($valueCol, array($ps))").as("__cuts"))
    df.join(cuts, col(groupCol) <=> col("__g"))
      .withColumn("pct", when(col(valueCol).isNull ||
          isnan(col(valueCol).cast("double")), lit(null).cast("int"))
        .otherwise(
          (size(filter(transform(col("__cuts"), c => round(c, 6)),
            c => c <= col(valueCol))) * (100 / gridSize)).cast("int")))
      .drop("__g", "__cuts")
  }

  /** Robust (MAD) outlier detection per group: flag rows whose
    * absolute deviation from the group MEDIAN exceeds k× the median
    * absolute deviation — the outlier gate that, unlike
    * [[zscoreByGroup]], is not itself dragged by the outliers it
    * hunts (mean and stddev both are). Same stats-join scale shape:
    * two group-keyed percentile aggregates joined back, facts never
    * shuffled on their own rows. Both compare sides are pre-rounded
    * to 6 decimals so the strict `>` is exact decimal arithmetic on
    * both engines.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol).as("__g1"))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val dev = df.join(med, col(groupCol) <=> col("__g1"))
      .withColumn("__ad", abs(col(valueCol) - col("__med")))
    val mad = dev.groupBy(col(groupCol).as("__g2"))
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    dev.join(mad, col(groupCol) <=> col("__g2"))
      .withColumn("deviation", round(col("__ad"), 6))
      .withColumn("cutoff", round(lit(k) * col("__mad"), 6))
      .filter(col("deviation") > col("cutoff"))
      .drop("__g1", "__g2", "__med", "__mad", "__ad")
  }

  /** A/B experiment readout: units split into two arms by the same
    * md5 bucket every sampler here uses (deterministic, engine-
    * portable — never an RNG), then Welch's unequal-variance t on the
    * metric. Sums are exact decimals (partition-order-free), so the
    * closing fixed-order double formula — and therefore the verdict —
    * is bit-reproducible on any engine; `significant` thresholds the
    * ROUNDED statistic at 1.96 so both engines compare the same
    * 6-decimal value. One aggregate pass, one output row.
    */
  def abTest(df: DataFrame, unitCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val arm = graft.operators.Curation.hashBucket(col(unitCol)) % 2
    val dec = col(valueCol).cast(DecimalType(18, 6))
    val sq = dec * dec
    // count EXACTLY the rows the sums include: a NULL metric (or a
    // value past decimal(18,6), which non-ANSI cast nulls) must drop
    // from count and sum together, or the means skew silently
    val agg = df.withColumn("__arm", arm).filter(dec.isNotNull).agg(
      sum(when(col("__arm") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("__arm") === 0, dec)).cast("double").as("__sa"),
      sum(when(col("__arm") === 1, dec)).cast("double").as("__sb"),
      sum(when(col("__arm") === 0, sq)).cast("double").as("__qa"),
      sum(when(col("__arm") === 1, sq)).cast("double").as("__qb"))
    val va = (col("__qa") - col("__sa") * col("__sa") / col("na")) /
      (col("na") - 1)
    val vb = (col("__qb") - col("__sb") * col("__sb") / col("nb")) /
      (col("nb") - 1)
    val t = round((col("__sa") / col("na") - col("__sb") / col("nb")) /
      sqrt(va / col("na") + vb / col("nb")), 6)
    agg.select(col("na"), col("nb"),
      round(col("__sa") / col("na"), 6).as("mean_a"),
      round(col("__sb") / col("nb"), 6).as("mean_b"),
      t.as("t"),
      (abs(t) >= 1.96).as("significant"))
  }

  /** Winsorization: clip each value into its group's
    * [percentile(lo), percentile(hi)] band (exact interpolated
    * percentiles, mirroring DuckDB's quantile_cont). The standard
    * outlier treatment before scaling features.
    */
  def winsorizeByGroup(df: DataFrame, valueCol: String, groupCol: String,
                       lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1")
    val stats = df.groupBy(col(groupCol).as("__grp"))
      .agg(expr(s"percentile($valueCol, $lo)").as("__lo"),
        expr(s"percentile($valueCol, $hi)").as("__hi"))
    df.join(stats, col(groupCol) <=> col("__grp"))
      .withColumn("winsorized",
        // least/greatest SKIP nulls — an unguarded NULL value would
        // come back as the hi cutoff, a fabricated observation
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(round(
            greatest(col("__lo"), least(col("__hi"), col(valueCol))), 6)))
      .drop("__grp", "__lo", "__hi")
  }

  /** Pearson chi-square drift over a slice × category contingency
    * table — the distribution-shift monitor a training pipeline runs
    * between ingestion batches, sources, or time windows: does the
    * categorical mix (language, quality bucket, length bucket, domain)
    * differ across slices more than sampling noise allows?
    *
    * Per cell: observed n, expected e = rowTotal·colTotal/total, and
    * the χ² contribution (n−e)²/e — the per-cell breakdown is the
    * actionable part (WHICH language drifted in WHICH source), the
    * total χ² is one `sum` away. Cells absent from the data are
    * structural zeros and still contribute (n=0, e>0): dropping them
    * understates drift exactly when a category vanishes from a slice —
    * the strongest possible shift signal.
    *
    * Scale shape: ONE groupBy(slice, category) over the facts; the
    * dense grid is marginals×marginals (slices × categories, a
    * bounded analytic frame, AQE-broadcast), never fact-sized. The
    * closing arithmetic is double over exact integer counts in a
    * fixed operation order, so any engine replays it bit-for-bit
    * (the [[pairwiseCorrelation]] discipline).
    *
    * Returns (slice, category, n, expected, chi2_term), both derived
    * columns rounded to 6 decimals.
    */
  def categoricalDrift(df: DataFrame, sliceCol: String, catCol: String)
      : DataFrame =
    categoricalDriftFromCounts(df
      .groupBy(col(sliceCol).as("slice"), col(catCol).as("category"))
      .agg(count(lit(1)).as("n")))

  /** [[categoricalDrift]] over PRE-AGGREGATED cells (slice, category,
    * n) — the entry the streaming monitor uses, where the reference
    * slice arrives as a stored count table rather than raw rows.
    */
  def categoricalDriftFromCounts(cellsIn: DataFrame): DataFrame = {
    // re-aggregate defensively: an appended/merged count table may
    // carry several rows per cell
    val cells = cellsIn.groupBy("slice", "category")
      .agg(sum("n").as("n"))
    val rowTot = cells.groupBy("category").agg(sum("n").as("__rt"))
    val colTot = cells.groupBy("slice").agg(sum("n").as("__ct"))
    val total = cells.select(sum("n").as("__tot"))
    // null-safe re-attach (the zscoreByGroup rule): a NULL category —
    // docs with missing lang — IS a category; groupBy kept it and the
    // marginals count it, so a plain equi-join here would zero its
    // observed count while leaving it in every expected value
    val c = cells.select(col("slice").as("__cs"),
      col("category").as("__cc"), col("n"))
    val dense = rowTot.crossJoin(colTot)
      .join(c, col("slice") <=> col("__cs") &&
        col("category") <=> col("__cc"), "left")
      .select(col("slice"), col("category"),
        coalesce(col("n"), lit(0L)).as("n"), col("__rt"), col("__ct"))
    // fixed order: e = (rt·ct)/tot, dev = n − e, term = (dev·dev)/e —
    // all double over exact integer counts; the oracle mirrors the
    // exact expression tree
    val e = col("__rt").cast("double") * col("__ct").cast("double") /
      col("__tot").cast("double")
    val dev = col("n").cast("double") - e
    dense.crossJoin(total)
      .select(col("slice"), col("category"), col("n"),
        round(e, 6).as("expected"),
        round(dev * dev / e, 6).as("chi2_term"))
  }

  /** Two-sample Kolmogorov–Smirnov drift per group — the CONTINUOUS
    * complement of [[categoricalDrift]]: for each group, the KS
    * statistic D = max over values of |F_a(v) − F_b(v)| between the
    * two slices' empirical CDFs of `valueCol` (did the VALUE
    * distribution — latency, quality score, doc length — shift
    * between two batches/periods?).
    *
    * Exact integer arithmetic throughout: D's candidate at value v is
    * |ca·nb − cb·na| with ca/cb the cumulative ≤v counts, so
    * ks_ppm = 10⁶·max|ca·nb − cb·na| div (na·nb) — no float ECDFs, so
    * any engine replays it bit-for-bit. The sup of the CDF difference
    * over ℝ is attained at a sample point, and evaluating at every
    * DISTINCT value with ≤ semantics covers ties exactly.
    *
    * Scale shape: one groupBy(group, slice, value) collapses the
    * facts, then the cumulative window runs per group over DISTINCT
    * VALUES (value-cardinality-bounded, not fact-bounded) — the same
    * discipline as the exact-percentile family. A group missing a
    * slice has no defined KS → null (guarded; a div-by-zero would
    * error on the oracle engine).
    *
    * Returns (group, n_a, n_b, ks_ppm).
    */
  def ksDrift(df: DataFrame, groupCol: String, sliceCol: String,
              aSlice: String, bSlice: String, valueCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df
      .filter(col(sliceCol).isin(aSlice, bSlice) &&
        col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("group"), col(valueCol).as("__v"))
      .agg(sum(when(col(sliceCol) === aSlice, 1L).otherwise(0L)).as("__na"),
        sum(when(col(sliceCol) === bSlice, 1L).otherwise(0L)).as("__nb"))
    val w = Window.partitionBy("group").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy("group")
    pts
      .withColumn("__ca", sum(col("__na")).over(w))
      .withColumn("__cb", sum(col("__nb")).over(w))
      .withColumn("n_a", sum(col("__na")).over(wall))
      .withColumn("n_b", sum(col("__nb")).over(wall))
      .groupBy(col("group"), col("n_a"), col("n_b"))
      .agg(max(abs(col("__ca") * col("n_b") - col("__cb") * col("n_a")))
        .as("__d"))
      .select(col("group"), col("n_a"), col("n_b"),
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
          .otherwise(expr("1000000L * __d div (n_a * n_b)"))
          .as("ks_ppm"))
  }
}
