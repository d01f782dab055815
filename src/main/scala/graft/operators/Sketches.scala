package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Distributed sketch operators: engine-portable HyperLogLog distinct
  * counting and Count-Min frequency estimation.
  *
  * At 100 TB an exact `count(DISTINCT token)` is a full shuffle of
  * every distinct key and an exact per-token frequency table is a
  * corpus-sized aggregation; the sketches below bound both to a few KB
  * of state per group with one partial-aggregable pass (`max`/`sum`
  * combine map-side, so the shuffle carries at most
  * groups × registers rows regardless of corpus size).
  *
  * Both sketches are built on [[Portable.hash32]] (md5-prefix), so the
  * DuckDB oracle reproduces every register and every counter
  * bit-for-bit — the estimates themselves are hash-checked, not just
  * spot-tested. No RNG anywhere; same data → same sketch on any
  * engine.
  *
  * (Extension surface: the reference has no sketching at all — its
  * distinct counts are pandas `nunique` over single-machine frames.)
  */
object Sketches {

  // ---- HyperLogLog (Flajolet et al. 2007) ----

  /** 2^6 = 64 registers: ±13 % standard error, 64 bytes of state per
    * group — the classic space/accuracy point for per-group stats.
    */
  val HllB = 6
  val HllM: Int = 1 << HllB
  /** alpha_64 from the HLL paper (m = 64 → alpha = 0.709 exactly). */
  val HllAlpha = 0.709
  /** Bits left after the bucket index: hash32 ∈ [0,2^32) → 26. */
  private val HllW = 32 - HllB

  /** Register rank rho: position of the leftmost 1-bit of the
    * remaining `HllW`-bit word (all-zero word → HllW+1). Uses
    * `length(bin(w))` = floor(log2 w)+1 — pure integer/string ops, so
    * Spark and DuckDB agree exactly (no floating log2).
    */
  private[operators] def rho(word: Column): Column =
    when(word > 0, lit(HllW + 1) - length(bin(word))).otherwise(lit(HllW + 1))

  /** Per-group HLL registers: one row per (group, bucket) with the max
    * rank observed. Partial-aggregable (`max`), so the shuffle is
    * bounded by groups × 64 rows.
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val h = Portable.hash32(col(keyCol))
    df.select(col(groupCol), (h % HllM).as("bucket"),
        rho(shiftright(h, HllB)).as("r"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("r")).as("m"))
  }

  /** Estimate from a prepared register table `(groupCols…, bucket, m)`
    * — shared by the direct per-group path and the merge path. The raw
    * HLL estimator alpha·m²/Σ2^−M (no small-range correction: `ln` is
    * libm-dependent and would break bit-identical oracles; at m = 64
    * the raw estimate is the documented contract, biased high below
    * ~2.5·m distinct keys). Every 2^−M term is a dyadic rational ≥
    * 2^−27, so the sum is EXACT in double under any addition order —
    * the estimate is deterministic without ordering tricks.
    */
  def hllEstimateFromRegisters(reg: DataFrame,
                               groupCols: Seq[String]): DataFrame =
    reg.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("present"),
        // SQL-form shiftleft: the Scala wrapper only takes a constant
        // shift, but register M is a column
        sum(expr("1.0 / cast(shiftleft(1L, m) as double)")).as("s_present"))
      // absent buckets hold register 0 → each contributes 2^0 = 1
      .select(groupCols.map(col) :+
        round(lit(HllAlpha * HllM * HllM) /
          ((lit(HllM) - col("present")).cast("double") + col("s_present")), 4)
          .as("hll_estimate"): _*)

  /** 64-register HLL block as ONE typed aggregate — the building
    * block of [[graft.operators.Validate.profileSketch]]: expressing
    * a register block as 64 separate `max(when(bucket = b, rho))`
    * agg expressions pushes a multi-column profile past the
    * whole-stage-codegen field limit into the interpreted aggregate
    * path (measured 5.7 s vs 1 s-class at sf0.1 × 4 columns); a
    * single array-buffered aggregate keeps the agg narrow at any
    * column count. Input (bucket, rho) as PRIMITIVES with −1 as the
    * null sentinel (an Option-tuple encoder boxes per row — measured
    * ~2× on the profile scan); a null value's digest contributes
    * nothing. Output: the 64 registers in bucket order,
    * 0 = untouched. Merge is element-wise max — the HLL shard
    * contract.
    */
  final class HllRegisterBlock
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Int), Array[Int], Seq[Int]] {
    override def zero: Array[Int] = new Array[Int](HllM)
    override def reduce(buf: Array[Int], in: (Long, Int)): Array[Int] = {
      if (in._1 >= 0) {
        val i = in._1.toInt
        if (in._2 > buf(i)) buf(i) = in._2
      }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < HllM) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
      org.apache.spark.sql.Encoders.kryo[Array[Int]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  /** Untyped-callable form: `hllRegisterBlock(bucketCol, rhoCol)` —
    * callers pass coalesce(bucket, −1)/coalesce(rho, −1).
    */
  lazy val hllRegisterBlock
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    implicit val inEnc: org.apache.spark.sql.Encoder[(Long, Int)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaInt)
    udaf(new HllRegisterBlock)
  }

  /** Merge whole register BLOCKS (the array form) — the aggregate twin
    * of a pairwise `zip_with(a, b, greatest)`: element-wise max over
    * any number of input rows per group. Used where several stored
    * blocks fold into one (merge-on-read over a maintained distinct
    * view's pending delta batches); same associative + idempotent
    * contract as [[hllMergeRegisters]].
    */
  final class HllBlockMerge
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Int], Array[Int], Seq[Int]] {
    override def zero: Array[Int] = new Array[Int](HllM)
    override def reduce(buf: Array[Int], in: Seq[Int]): Array[Int] = {
      if (in != null) {
        var i = 0
        val n = in.length.min(HllM)
        while (i < n) { if (in(i) > buf(i)) buf(i) = in(i); i += 1 }
      }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < HllM) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
      org.apache.spark.sql.Encoders.kryo[Array[Int]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  /** Untyped-callable form: `hllBlockMerge(regsCol)`. */
  lazy val hllBlockMerge
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    implicit val inEnc: org.apache.spark.sql.Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
    udaf(new HllBlockMerge)
  }

  /** Per-group approximate distinct count. */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCol, keyCol),
      Seq(groupCol))

  /** MERGE per-group register tables into one global estimate —
    * register-wise max. Mergeability is the property that makes the
    * sketch matter at 100 TB: per-shard / per-day / per-source
    * sketches (64 rows each) combine into corpus-level answers with no
    * re-scan of the data that built them, and `max` is associative +
    * idempotent, so any merge tree (and re-merging overlapping
    * sketches) gives the SAME registers as sketching the union
    * directly — spec-pinned bit-for-bit.
    */
  def hllMergeRegisters(reg: DataFrame): DataFrame =
    reg.groupBy(col("bucket")).agg(max(col("m")).as("m"))

  // ---- Count-Min sketch (Cormode & Muthukrishnan 2005) ----

  /** depth 4 × width 256 = 1024 counters (8 KB): error ≤ 2N/width with
    * probability 1 − 2^−depth; an always-overestimate for heavy
    * hitters at corpus scale in one pass.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Row-d bucket: 8-bit slice d of ONE 60-bit md5 prefix —
    * `(h >> 8d) & 255`. The depth rows read DISJOINT bit ranges of the
    * same digest, so they act as independent hash functions while the
    * corpus pays exactly one md5 per token occurrence (a "d:token"
    * re-hash per row would cost depth× the dominant scan work at
    * 100 TB). SQL-form shift: the Scala shiftright wrapper only takes
    * a constant, but d is a column after the explode.
    */
  def cmsBucket(dCol: String, h60Col: String): Column =
    expr(s"shiftright($h60Col, 8 * $dCol) & ${CmsWidth - 1}")

  /** Build the sketch: ≤ depth×width counter rows. The token is
    * hashed ONCE, then the explode multiplies rows by `depth` BEFORE
    * the aggregation; the groupBy partial-aggregates map-side, so the
    * shuffle carries at most depth × width × partitions rows — never
    * corpus-sized.
    */
  def cmsSketch(df: DataFrame, tokenCol: String): DataFrame =
    df.select(Portable.hash60(col(tokenCol)).as("h"))
      .select(explode(sequence(lit(0), lit(CmsDepth - 1))).as("d"), col("h"))
      .groupBy(col("d"), cmsBucket("d", "h").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the frequency of each candidate token: min over
    * the depth rows of the counter the token hashes to. The sketch is
    * ≤ 1024 rows → broadcast; the candidate set never shuffles.
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
                  tokenCol: String): DataFrame = {
    val cand = candidates
      .select(col(tokenCol), Portable.hash60(col(tokenCol)).as("h"))
      .select(col(tokenCol), col("h"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("d"))
      .withColumn("bucket", cmsBucket("d", "h"))
    cand.join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(col(tokenCol))
      .agg(min(col("cnt")).as("n_est"))
  }

  // ---- K-minimum-values sketch (Bar-Yossef et al. 2002) ----

  /** k = 64 minimum hash values per group. HLL (above) estimates each
    * set ALONE; KMV sketches compose — the merged sketch of two groups
    * estimates their UNION, and the overlap of the retained samples
    * estimates Jaccard/intersection. That answers "how much does
    * source A's vocabulary overlap source B's" — the question a
    * mixture planner or contamination triage asks at 100 TB — without
    * ever joining two corpus-wide key sets.
    */
  val KmvK = 64

  /** Per-group KMV sketch `(group, hv, rk)`: the [[KmvK]] smallest
    * DISTINCT hash32 values of the key, ranked ascending. The rank
    * filter is the row_number-over-window shape
    * [[graft.plans.GroupedTopKRule]] rewrites to the bounded-heap
    * exec, so per-group state is O(k) — never distinct-count-sized.
    */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("hv"))
    df.select(col(groupCol), Portable.hash32(col(keyCol)).as("hv"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KmvK)
  }

  /** All-pairs overlap report: for every group pair (ga < gb), the KMV
    * union estimate ((k−1)/U_k, exact below k values), the Jaccard
    * estimate (fraction of the MERGED k-minimum sample present in both
    * sides), and the exact common/union/Jaccard as the yardstick —
    * the sketch error is itself oracle-pinned, like q_hll_distinct.
    *
    * Work shape: one corpus pass builds the sketches; everything
    * pairwise is sketch-sized (≤ groups² × k rows). The exact columns
    * cost a key-wide self-join and exist only as the pinned truth —
    * production reads the est columns and drops that join.
    */
  def kmvOverlap(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val sk = kmvSketch(df, groupCol, keyCol)
    val ga = sk.select(col(groupCol).as("ga"), col("hv"))
    val gb = sk.select(col(groupCol).as("gb"), col("hv"))
    val pairs = ga.select("ga").distinct()
      .crossJoin(gb.select("gb").distinct())
      .filter(col("ga") < col("gb"))
    // merged value set per pair, with side-membership flags
    val pv = pairs.join(ga, Seq("ga"))
      .select(col("ga"), col("gb"), col("hv"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairs.join(gb, Seq("gb"))
        .select(col("ga"), col("gb"), col("hv"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("ga", "gb", "hv")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val wm = Window.partitionBy(col("ga"), col("gb")).orderBy(col("hv"))
    val merged = pv.withColumn("rk", row_number().over(wm))
      .filter(col("rk") <= KmvK)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n"), max("hv").as("kth"),
        sum(col("in_a") * col("in_b")).as("in_both"))
    // exact companion: distinct keys per group, pairwise intersection
    val dt = df.select(col(groupCol).as("g"), col(keyCol).as("k")).distinct()
    val sizes = dt.groupBy("g").agg(count(lit(1)).as("sz"))
    val inter = dt.select(col("g").as("ga"), col("k"))
      .join(dt.select(col("g").as("gb"), col("k")), Seq("k"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("ec"))
    // (k−1)/U_k with U_k = kth/2^32; exact count below k values
    val estUnion = when(col("n") < KmvK, col("n").cast("double"))
      .otherwise(lit((KmvK - 1).toDouble * 4294967296.0) / col("kth"))
    val exactCommon = coalesce(col("ec"), lit(0L))
    val exactUnion = col("sza") + col("szb") - exactCommon
    merged
      .join(sizes.select(col("g").as("ga"), col("sz").as("sza")), Seq("ga"))
      .join(sizes.select(col("g").as("gb"), col("sz").as("szb")), Seq("gb"))
      .join(inter, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"),
        exactCommon.as("exact_common"),
        exactUnion.as("exact_union"),
        round(exactCommon.cast("double") / exactUnion, 6).as("exact_jaccard"),
        round(col("in_both").cast("double") / col("n"), 6).as("kmv_jaccard"),
        round(estUnion, 4).as("kmv_union"))
  }

  // ---- Fast-AGMS join-size sketch (Alon–Matias–Szegedy 1996; the
  // bucketed Count-Sketch refinement of Cormode & Garofalakis 2005) ----

  /** Sketch width: per-group state is `AmsBuckets` longs. A plain
    * (unbucketed) AMS tug-of-war with 16 counters was measured at
    * ±40 % on the documents token stream — zipfian heavy hitters
    * dominate the variance; bucketing divides it by the width
    * (err ~ √(F₂(A)·F₂(B)/B)), and 256 longs is still trivially
    * broadcast/merge-sized.
    */
  val AmsBuckets = 256

  /** Per-group Fast-AGMS sketch `(group, b, xv)`: each key row lands
    * in bucket (h≫1) mod B with sign bit 0 of ONE 60-bit md5-prefix
    * digest (bucket and sign read disjoint bits), xv = Σ signs.
    * `sum` combines map-side — the shuffle carries ≤ groups × B rows
    * regardless of input size — and sketches from shards ADD
    * bucket-wise into the corpus sketch (same merge contract as the
    * HLL register max).
    */
  def amsSketch(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.select(col(groupCol), Portable.hash60(col(keyCol)).as("__h"))
      .select(col(groupCol),
        (shiftright(col("__h"), 1) % AmsBuckets).as("b"),
        (col("__h").bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as("s"))
      .groupBy(col(groupCol), col("b"))
      .agg(sum(col("s")).as("xv"))

  /** All-pairs equi-join-size report: for each group pair (ga < gb)
    * the Fast-AGMS estimate Σ_b X_a[b]·X_b[b] (expectation = the true
    * Σ_key n_a·n_b — exact integer arithmetic end to end) next to the
    * exact yardstick.
    *
    * This is the 100 TB join PLANNER'S input: the output/shuffle
    * volume of a planned blocked join (dedup candidate generation,
    * token-keyed enrichment) priced from groups × [[AmsBuckets]]
    * longs of mergeable sketch state — the exact column costs the
    * very join being priced and exists only for the oracle.
    */
  def amsJoinSize(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val sk = amsSketch(df, groupCol, keyCol)
    val est = sk.select(col(groupCol).as("ga"), col("b"), col("xv").as("xa"))
      .join(sk.select(col(groupCol).as("gb"), col("b"), col("xv").as("xb")),
        Seq("b"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb")
      .agg(sum(col("xa") * col("xb")).as("ams_est"))
    val tf = df.groupBy(col(groupCol), col(keyCol)).agg(count(lit(1)).as("n"))
    val exact = tf.select(col(groupCol).as("ga"), col(keyCol).as("k"),
        col("n").as("na"))
      .join(tf.select(col(groupCol).as("gb"), col(keyCol).as("k"),
        col("n").as("nb")), Seq("k"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb")
      .agg(sum(col("na") * col("nb")).as("exact_join_size"))
    est.join(exact, Seq("ga", "gb"), "left")
      .na.fill(0L, Seq("exact_join_size"))
  }

  /** Trailing-window distinct via mergeable registers — the
    * sliding-window form of [[hllDistinct]]: per-day register tables
    * merge by MAX over the trailing `windowDays` calendar window,
    * then each day's estimate closes from its 64 merged registers.
    * The merge runs as a range-frame window over a DENSE day × bucket
    * grid (days × 64 rows — a bucket untouched today must still
    * surface its in-window rank from an earlier day, and range frames
    * only see rows that exist). Exact trailing distinct carries every
    * (day, key) pair into every window it covers (cost ∝ windowDays ×
    * distinct facts — how the exact rolling-AU works); the sketch
    * path carries days × 64 register rows regardless of corpus size —
    * the 100 TB form of the trailing-distinct dashboard, and the
    * stored form is per-day registers that any later window width can
    * re-merge without touching the facts. Keys hash via their STRING
    * rendering (int/string keys — the [[graft.operators.Validate
    * .profileSketch]] portability bound).
    */
  def hllSlidingDistinct(df: DataFrame, tsCol: String, keyCol: String,
                         windowDays: Int): DataFrame = {
    val daily = df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"),
        col(keyCol).cast("string").as("__k"))
    val reg = hllRegisters(daily, "day", "__k")
    val days = daily.select("day").distinct()
    val grid = days.crossJoin(
      spark_range_buckets(daily.sparkSession))
      .join(reg, Seq("day", "bucket"), "left")
      .withColumn("__epoch",
        datediff(col("day"), to_date(lit("1970-01-01"))))
    val w = Window.partitionBy(col("bucket")).orderBy(col("__epoch"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    // close through the ONE estimator implementation — absent-in-
    // window grid cells (mw null) drop out exactly like absent
    // register rows in the direct per-group path
    val merged = grid.withColumn("mw", max(col("m")).over(w))
    val est = hllEstimateFromRegisters(
      merged.filter(col("mw").isNotNull)
        .select(col("day"), col("bucket"), col("mw").as("m")),
      Seq("day"))
    val dk = daily.distinct()
    val exact = days.as("g")
      .join(dk.as("f"),
        datediff(col("g.day"), col("f.day")).between(0, windowDays - 1))
      .groupBy(col("g.day").as("day"))
      .agg(countDistinct(col("f.__k")).as("exact_distinct"))
    est.join(exact, Seq("day"))
      // day rendered as the ISO string (the engine's report-column
      // convention for dates; string order ≡ chronological)
      .select(col("day").cast("string").as("day"),
        col("exact_distinct"), col("hll_estimate"))
  }

  /** The 64-bucket dimension frame for the dense sliding grid. */
  private def spark_range_buckets(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(HllM).select(col("id").cast("long").as("bucket"))

  /** Per-group second moment (F₂ = Σ_key n_key²) from the SAME
    * sketch: E[Σ_b X[b]²] = F₂ exactly — the original AMS statistic.
    * F₂/n² is the collision mass of a hash-partitioned shuffle on the
    * key, i.e. THE skew indicator: a group whose F₂ approaches n²
    * funnels its shuffle into one partition ([[Scale]]'s salting
    * trigger), and this reads it from 256 longs instead of
    * [[graft.operators.Scale.skewReport]]'s exact per-key pass.
    * Exact companion beside the estimate, as everywhere.
    */
  def amsSelfJoinSize(df: DataFrame, groupCol: String,
                      keyCol: String): DataFrame = {
    val est = amsSketch(df, groupCol, keyCol)
      .groupBy(col(groupCol))
      .agg(sum(col("xv") * col("xv")).as("f2_est"))
    val exact = df.groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(sum(col("n") * col("n")).as("f2_exact"))
    est.join(exact, groupCol)
  }

  // ---- log₂-histogram quantile sketch ----

  /** Per-group log₂ histogram of a non-negative long column: bucket 0
    * holds the zeros, bucket b ≥ 1 holds values in [2^(b−1), 2^b).
    * `length(bin(v))` = floor(log₂ v)+1 — pure integer/string ops
    * (the [[rho]] trick), so any engine buckets identically; no
    * floating log. ≤ 65 rows per group, count-mergeable: histograms
    * from shards SUM into the corpus histogram (same contract as the
    * HLL register max-merge), which is why this answers quantile
    * queries over 100 TB with one map-side-combined groupBy where an
    * exact percentile needs a per-group sort of all values.
    */
  def logHistogram(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(col(groupCol),
        when(col(valueCol) > 0, length(bin(col(valueCol))))
          .otherwise(lit(0)).as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile BOUNDS from a [[logHistogram]]: for each percentile p,
    * the smallest bucket whose cumulative count reaches rank
    * ⌈p·n/100⌉, reported as the bucket's [lo, hi] value range — the
    * true order statistic provably lies inside (relative error ≤ 2×,
    * the log-bucket width; spec-pinned against the exact percentile).
    * The cumulative window partitions by GROUP over ≤ 65 bucket rows
    * — bounded state, never value-count-sized. Rank comparison is the
    * exact rational `cum·100 ≥ n·p` (no float division).
    */
  def logQuantileBounds(df: DataFrame, groupCol: String, valueCol: String,
                        pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1,100]")
    val hist = logHistogram(df, groupCol, valueCol)
    val wc = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
    val wt = Window.partitionBy(col(groupCol))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("total", sum(col("cnt")).over(wt))
    val qb = pcts.map(p =>
      min(when(col("cum") * 100 >= col("total") * p, col("bucket")))
        .as(s"p${p}_b"))
    val bounds = pcts.flatMap { p =>
      val b = col(s"p${p}_b")
      Seq(
        when(b > 0, expr(s"shiftleft(cast(1 as bigint), p${p}_b - 1)"))
          .otherwise(lit(0L)).as(s"p${p}_lo"),
        (expr(s"shiftleft(cast(1 as bigint), p${p}_b)") - 1)
          .as(s"p${p}_hi"))
    }
    cum.groupBy(col(groupCol)).agg(qb.head, qb.tail: _*)
      .select(col(groupCol) +: bounds: _*)
  }

  // ---- bounded-error mergeable quantile sketch ----

  /** Per-group quantile SKETCH `(group, hv, key, v, rk)`: the `m`
    * rows whose row-key hashes smallest, i.e. a deterministic uniform
    * sample selected by HASH ORDER — the order-free analogue of a KLL
    * compactor level. A classic KLL's buffer content depends on row
    * INSERTION order, which no distributed engine reproduces across
    * partitionings (and no oracle can replay); selecting by
    * (hash32(key), key) instead makes the sketch content an exact
    * function of the DATA SET — engine-exact, partition-independent,
    * and SQL-replayable like the KMV/HLL/CMS sketches.
    *
    * Error: the m-sample estimate of percentile p is off by rank
    * ε·n with probability ≤ 2·exp(−2ε²m) (Hoeffding) — e.g. m = 4096
    * gives ε ≈ 2.4 % at 99 % confidence; m = 64 gives ε ≈ 19 %.
    * Exact whenever the group has ≤ m rows. Against
    * [[logQuantileBounds]] (value-relative 2× octave bounds, 65 rows
    * of state), this trades m rows of state for RANK-relative error —
    * the two tiers answer different SLAs.
    *
    * Scale shape: the rank filter is the row_number-over-window shape
    * [[graft.plans.GroupedTopKRule]] rewrites to the bounded-heap
    * exec — per-group state is O(m), never group-sized.
    */
  def quantileSketch(df: DataFrame, groupCol: String, keyCol: String,
                     valueCol: String, m: Int = 4096): DataFrame = {
    require(m >= 1, "sample size must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("hv"), col("key"))
    // key carried AS STRING: hv ties (32-bit hash collisions — real at
    // corpus scale) must break identically in the batch sketch, the
    // SQL oracle, and the streaming state (whose key is a string), or
    // the pinned merge/stream equalities fail exactly when it matters
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        Portable.hash32(col(keyCol).cast("string")).as("hv"),
        col(keyCol).cast("string").as("key"), col(valueCol).as("v"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
  }

  /** MERGE of [[quantileSketch]] shards: bottom-m by hash of the
    * union. Exactly the direct sketch of the concatenated data —
    * the global m smallest hashes are each within their shard's m
    * smallest (spec-pinned merge ≡ direct) — so shard sketches
    * compose across files, days, or clusters without re-reading data.
    */
  def quantileSketchMerge(a: DataFrame, b: DataFrame, groupCol: String,
                          m: Int = 4096): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("hv"), col("key"))
    a.select(col(groupCol), col("hv"), col("key"), col("v"))
      .unionByName(b.select(col(groupCol), col("hv"), col("key"), col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
  }

  /** KS drift BETWEEN TWO STORED SKETCHES — distribution-shift
    * monitoring without re-scanning either batch: the hash-ordered
    * bottom-m sketch is a uniform sample of its batch's distinct
    * keys, so the exact two-sample KS over the two samples
    * ([[graft.operators.Features.ksDrift]]'s integer ECDF arithmetic)
    * estimates the population KS with the sketch family's Hoeffding
    * error (√(ln(2/δ)/2m) per side). At 100 TB this is how drift
    * between ingestion batches is actually checked: two m-row tables
    * from the sketch store, never the corpora. Identical sketches
    * give EXACTLY 0 (spec-pinned). Returns (group, n_a, n_b, ks_ppm).
    */
  def sketchKsDrift(a: DataFrame, b: DataFrame, groupCol: String)
      : DataFrame =
    graft.operators.Features.ksDrift(
      a.select(col(groupCol), lit("a").as("__slice"), col("v"))
        .unionByName(
          b.select(col(groupCol), lit("b").as("__slice"), col("v"))),
      groupCol, "__slice", "a", "b", "v")

  /** Percentile ESTIMATES from a [[quantileSketch]]: for each
    * percentile p, the sample order statistic at rank
    * ⌈p·|sample|/100⌉ — the exact rational `sr·100 ≥ sm·p`, no float
    * division. The per-group window sorts ≤ m sketch rows — bounded
    * state. Estimate columns are `est_p<p>`.
    */
  def sketchQuantiles(sketch: DataFrame, groupCol: String,
                      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1,100]")
    val wv = Window.partitionBy(col(groupCol))
      .orderBy(col("v"), col("key"))
    val wt = Window.partitionBy(col(groupCol))
    val ranked = sketch
      .withColumn("sr", row_number().over(wv))
      .withColumn("sm", count(lit(1)).over(wt))
    val ests = pcts.map(p =>
      min(when(col("sr") * 100 >= col("sm") * p, col("v")))
        .as(s"est_p$p"))
    ranked.groupBy(col(groupCol)).agg(ests.head, ests.tail: _*)
  }
}
