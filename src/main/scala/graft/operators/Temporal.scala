package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks but any event/training
  * pipeline at scale needs: as-of joins (latest right row at or before
  * each left timestamp) and range joins (point-in-interval), both in
  * shuffle-bounded forms.
  *
  * Scale design:
  * - [[asofJoin]] is the union-sort form: ONE shuffle on the key, no
  *   join at all. Tagging both sides into a single sorted stream and
  *   carrying the last non-null right payload forward beats the naive
  *   "filter right < ts, window, rank" plan (which joins then discards
  *   almost everything) and stays skew-safe — each key's stream is
  *   processed linearly.
  * - [[rangeJoinBucketed]] turns the O(|L|·|R|) inequality join into
  *   an equi-join on (key, time bucket): each interval is exploded
  *   into the buckets it covers, points join their bucket, and the
  *   residual predicate runs on co-located rows only. Bucket width is
  *   the tuning knob: ~= median interval length keeps the explosion
  *   factor ~2 while pruning all non-overlapping pairs.
  */
object Temporal {

  /** As-of join: for each `left` row, the `payloadCols` of the LATEST
    * `right` row with the same `keys` and `right.tsCol <= left.tsCol`
    * (nulls when no such row). Right payload lands as
    * `prefix + name`.
    *
    * Right rows must be unique per (keys, tsCol) — pre-aggregate ties
    * away (the window's last-wins on equal timestamps would otherwise
    * be nondeterministic).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               prefix: String = "asof_",
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"bad direction $direction")
    val leftCols = left.columns.toSeq
    payloadCols.foreach(c => require(!leftCols.contains(prefix + c),
      s"output column '$prefix$c' collides with a left column; " +
        "pass a different prefix"))
    val carryCols = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    // the payload travels as ONE struct, non-null for every right row:
    // filling columns independently with last(ignoreNulls) would skip
    // a genuinely-NULL payload in the latest right row in favor of an
    // older row's value (and could even mix columns from different
    // rows) — the struct keeps "latest right ROW" semantics, nulls and
    // all, matching DuckDB's ASOF JOIN
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    // tag: right=0 sorts before left=1 at equal ts, so the boundary is
    // inclusive in BOTH directions (backward `right.ts <= left.ts`,
    // forward `right.ts >= left.ts` — forward just walks the stream
    // from the future end, nothing else changes)
    val lTagged = left.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(payloadType))
    val rTagged = carryCols.foldLeft(
      // a NULL right ts can match nothing ("right.ts <= left.ts" is
      // never true for NULL) — but asc ordering sorts NULLS FIRST, so
      // an unfiltered null-ts row's payload would leak into every left
      // row before the first real right row
      right.filter(col(tsCol).isNotNull)
        .select((keys :+ tsCol).map(col) :+
          struct(payloadCols.map(col): _*).as("__asof"): _*)
        .withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val tsOrd =
      if (direction == "forward") col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__asof").getField(c).as(s"$prefix$c")): _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) compression: per key,
    * collapse consecutive runs of an equal attribute into validity
    * intervals `[valid_from, valid_to)` — the warehouse primitive that
    * turns an event log into a point-in-time dimension (pair with
    * [[asofJoin]] to query "the attribute as of ts"). `valid_to` is
    * NULL for each key's current (open) interval.
    *
    * Change detection is null-safe (a null attribute is a value, not a
    * wildcard). `tieCol` totals the order within equal timestamps —
    * without it the run boundaries would be partition-order dependent.
    * Two windows over ONE shuffle on the key (both windows share the
    * partitioning and sort).
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, attrCol: String,
           tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col("__prev") <=> col(attrCol)))
    val w2 = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .drop("__prev", "__first")
  }

  /** Time-range rolling aggregates: per key, count/sum over the
    * trailing `windowSec` seconds ending at each row (RANGE frame over
    * epoch micros, so all peers of an equal timestamp fall in the
    * frame — the time-series feature shape a RANGE row count can't
    * express when event spacing is uneven). One shuffle on the key;
    * the sum is decimal so the result is partition-order independent
    * (a double sum over a sliding frame is order-dependent and engine-
    * specific — DuckDB's segment tree vs Spark's frame re-scan would
    * diverge in final ulps).
    */
  def rollingByTime(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0L)
    df.withColumn("rolling_n", count(lit(1)).over(w))
      .withColumn("rolling_sum",
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double"))
  }

  /** Gaps-and-islands interval merge: per key, coalesce overlapping or
    * touching `[startCol, endCol]` intervals into maximal islands —
    * coverage analysis (time online, sensor uptime, contiguous
    * validity) in one window pass + one groupBy, both keyed on the
    * key column (a self-join formulation is O(n²) per key and the
    * classic anti-pattern here).
    *
    * Mechanics: order intervals by (start, end); an interval starts a
    * NEW island iff its start exceeds the running max end of all
    * previous intervals; the running count of island-starts is the
    * island id. Timestamps are compared as epoch micros (exact
    * integers).
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(unix_micros(col(endCol)))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("__new_island",
        when(prevMaxEnd.isNull ||
          unix_micros(col(startCol)) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island_id",
        sum(col("__new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(keyCol), col("island_id"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Bucketed range join: rows of `points` matched to rows of
    * `intervals` with equal `keys` and
    * `startCol <= points.tsCol <= endCol` (inner). Both timestamps are
    * mapped to `bucketSeconds`-wide epoch buckets; intervals explode
    * into every bucket they span, the join is an equi-join on
    * (keys, bucket), and the range predicate filters co-located
    * candidates. Exact — bucketing only prunes, never drops a match.
    */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String], tsCol: String, startCol: String,
                        endCol: String, bucketSeconds: Long): DataFrame = {
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / bucketSeconds).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(tsCol)))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Frequent behavior-pattern mining: the corpus-wide top-k length-3
    * event-type sequences (per-user, time-ordered, overlapping) — the
    * "what do users actually do" report that funnels assume an answer
    * to. Patterns render as `a>b>c`.
    *
    * One user-keyed window (two leads share its single shuffle and
    * sort), one pattern-keyed count with map-side combine, and a
    * TakeOrdered top-k — the rank window runs over the ≤k survivors
    * only.
    */
  def eventPatterns(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, tieCol: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val counted = events
      .withColumn("__t1", lead(col(typeCol), 1).over(w))
      .withColumn("__t2", lead(col(typeCol), 2).over(w))
      .filter(col("__t2").isNotNull)
      .select(concat_ws(">", col(typeCol), col("__t1"), col("__t2"))
        .as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n"))
    val top = counted.orderBy(col("n").desc, col("pattern").asc).limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("n").desc, col("pattern").asc)))
      .select(col("rk"), col("pattern"), col("n"))
  }

  /** K-anonymity generalization ladder: for each event, the FINEST
    * time granularity (hour → day → month) at which its
    * (type, bucket) group reaches size `k`, reported as a compact
    * (type, granularity, n_events) matrix — the privacy-engineering
    * answer to "how much must timestamps be coarsened before release",
    * with `suppress` counting the rows no ladder rung can save.
    *
    * Three (type, bucket)-keyed aggregates with map-side combine,
    * joined back on their bucket keys (count frames are
    * bucket-bounded, AQE broadcasts them) — no per-partition window
    * sort anywhere.
    */
  def anonymizationLadder(events: DataFrame, typeCol: String, tsCol: String,
                          k: Long = 5L): DataFrame = {
    val e = events
      .withColumn("__h", date_trunc("hour", col(tsCol)))
      .withColumn("__d", date_trunc("day", col(tsCol)))
      .withColumn("__m", date_trunc("month", col(tsCol)))
    // NULL-SAFE group joins: a privacy report must not silently DROP
    // rows it cannot classify — a NULL event type (or NULL ts bucket)
    // groups and joins as its own value instead of vanishing through
    // null-unsafe equality, the worst failure direction for a
    // suppression report
    def sizes(c: String, out: String) =
      e.groupBy(col(typeCol).as("__t"), col(c).as("__c"))
        .agg(count(lit(1)).as(out))
    def joinSz(df: DataFrame, sz: DataFrame, c: String) =
      df.join(sz, col(typeCol) <=> col("__t") && col(c) <=> col("__c"))
        .drop("__t", "__c")
    joinSz(joinSz(joinSz(e,
        sizes("__h", "__nh"), "__h"),
        sizes("__d", "__nd"), "__d"),
        sizes("__m", "__nm"), "__m")
      .withColumn("granularity",
        when(col("__nh") >= k, "hour")
          .when(col("__nd") >= k, "day")
          .when(col("__nm") >= k, "month")
          .otherwise("suppress"))
      .groupBy(col(typeCol), col("granularity"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Cohort retention matrix: users are grouped into cohorts by the
    * ISO week (Monday-truncated) of their FIRST event; for each
    * (cohort, week offset) the count of cohort members active that
    * week, plus the retention ratio vs the cohort size — the
    * product-analytics table next to [[funnelSteps]].
    *
    * Scale shape: two user-keyed aggregates (first-event week, then
    * distinct active weeks — both map-side combinable) joined on the
    * user key, re-aggregated on (cohort, offset). The cohort-size
    * frame is weeks-sized — AQE broadcasts it back. A user appears
    * once per distinct active week and weeks are offset-unique per
    * user, so the final count(*) IS the distinct-user count without a
    * count-distinct shuffle.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    def week(c: Column): Column = date_trunc("week", c)
    val firstWeek = events.groupBy(col(userCol))
      .agg(week(min(col(tsCol))).as("__cohort"))
    val activeWeeks = events
      .select(col(userCol), week(col(tsCol)).as("__week")).distinct()
    val counts = activeWeeks.join(firstWeek, userCol)
      .withColumn("week_offset",
        floor(datediff(col("__week"), col("__cohort")) / 7).cast("int"))
      .groupBy(col("__cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firstWeek.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    counts.join(sizes, "__cohort")
      .select(
        date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention_pct"))
  }

  /** Rolling distinct active users: per observed day, the exact
    * distinct-user count for that day (DAU) and over the trailing
    * `windowDays` window (the WAU/MAU family). Window COUNT(DISTINCT)
    * doesn't exist as a window function on either engine — and a
    * sketch would be approximate — so each distinct (day, user) pair
    * is fanned out to the `windowDays` report days it contributes to
    * and re-distinct-counted: exact, and every shuffle is keyed on a
    * day (bounded cardinality) or (day, user) — never a user's whole
    * history in one partition.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    // windowDays <= 0 would make sequence() run DESCENDING, silently
    // counting users from FUTURE days
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val daily = events
      .select(to_date(col(tsCol)).as("__day"), col(userCol).as("__user"))
      .distinct()
    val dau = daily.groupBy("__day").agg(count(lit(1)).as("dau"))
    val rolling = daily
      .select(explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))).as("__tday"), col("__user"))
      .distinct()
      .groupBy("__tday").agg(count(lit(1)).as("rolling_users"))
    // inner join restricts the report to OBSERVED days (each day
    // contributes to itself, so no observed day is lost)
    dau.join(rolling, col("__day") === col("__tday"))
      .select(date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("rolling_users"))
  }

  /** Time-series gap fill + forward fill: per key, a dense spine of
    * `stepSeconds`-wide buckets from the key's first to last event;
    * each bucket carries its event count and the value of its LAST
    * event (ties broken by `tieCol`), with empty buckets forward-
    * filled from the most recent observed bucket — the
    * resample-then-ffill primitive feature pipelines need before
    * lag/rolling features can assume even spacing.
    *
    * Scale shape: one (key, bucket) window pass picks the per-bucket
    * last event, one key-wise min/max aggregate builds the spine
    * (explosion factor = span/step, a config knob), and the forward
    * fill is one key-keyed window — three key-partitioned shuffles,
    * no self-join. Spine width is bounded by each key's OWN span, so
    * a short-lived key costs nothing even when the corpus spans years.
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, tieCol: String,
              stepSeconds: Long = 3600L): DataFrame = {
    val stepUs = stepSeconds * 1000000L
    def bucketOf(c: Column): Column =
      floor(unix_micros(c) / stepUs).cast("long")
    // last-in-bucket via a combinable max-struct aggregate, not a
    // per-(key, bucket) window: the struct max (ts, tie, value)
    // partial-aggregates map-side — no per-partition sort, no window
    // state over the raw events; deterministic because (ts, tie) is
    // the same total order the window form sorted by
    val lastInBucket = events.withColumn("__h", bucketOf(col(tsCol)))
      .groupBy(col(keyCol), col("__h"))
      .agg(max(struct(col(tsCol).as("t"), col(tieCol).as("tb"),
          col(valueCol).as("v"))).as("__m"),
        count(lit(1)).as("__n"))
      .select(col(keyCol), col("__h"),
        col("__m").getField("v").as("__v"), col("__n"))
    val spine = events.groupBy(col(keyCol))
      .agg(bucketOf(min(col(tsCol))).as("__h0"),
        bucketOf(max(col(tsCol))).as("__h1"))
      .select(col(keyCol), explode(sequence(col("__h0"), col("__h1"))).as("__h"))
    val ffill = Window.partitionBy(col(keyCol)).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(lastInBucket, Seq(keyCol, "__h"), "left")
      .withColumn("__fv", last(col("__v"), ignoreNulls = true).over(ffill))
      .select(col(keyCol),
        date_format(timestamp_seconds(col("__h") * stepSeconds),
          "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        round(col("__fv"), 6).as("filled_value"),
        // observed = the bucket HAD events (spine hit), not "the last
        // event's value was non-null" — a latest-row NULL value is
        // still an observation (the asofJoin latest-row contract)
        col("__n").isNotNull.as("observed"))
  }

  /** Ordered funnel analysis: for each step sequence (e.g. view →
    * click → purchase), how many users completed step k STRICTLY
    * AFTER their step k−1 completion — the product-analytics query
    * every event pipeline runs. Earliest-completion semantics: a user
    * "reaches" step k at the minimum timestamp of a step-k event
    * later than their step k−1 reach time (the standard greedy funnel
    * — earliest reach maximizes downstream conversions under strict
    * ordering). With `maxGapSeconds > 0`, step k must also land
    * within that window after step k−1 (the windowed funnel product
    * analytics actually reports — unbounded funnels saturate on any
    * long-lived user base).
    *
    * Scale shape: one user-keyed min-aggregate per step over ONLY
    * that step's events (event-type filter pushes to the scan), each
    * joined to the previous step's user frame — k small user-keyed
    * shuffles with map-side-combinable mins; never a window over a
    * user's whole history, never an events×events self-join. Report:
    * (step, event_type, n_users, pct_of_prev, pct_of_first).
    */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  maxGapSeconds: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val gapped = maxGapSeconds > 0
    val spark = events.sparkSession
    // localCheckpoint per step: each step's user frame feeds both the
    // next step's join and its own count — unmaterialized, step k
    // would re-run steps 1..k-1 (O(k²) jobs)
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .localCheckpoint()
    var counts = Vector(reached.count())
    for (s <- steps.tail) {
      val inWindow =
        if (gapped)
          col(tsCol) > col("__t") &&
            col(tsCol) <= col("__t") + expr(s"INTERVAL $maxGapSeconds SECONDS")
        else col(tsCol) > col("__t")
      reached = events.filter(col(typeCol) === s)
        .join(reached, userCol)
        .filter(inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .localCheckpoint()
      counts :+= reached.count()
    }
    import spark.implicits._
    // ratios + rounding stay IN the engine (same round() the other
    // count-ratio queries use, proven hash-stable vs the oracle)
    steps.zipWithIndex.map { case (s, i) =>
      (i + 1, s, counts(i), if (i == 0) counts(0) else counts(i - 1),
        counts(0))
    }.toDF("step", "event_type", "n_users", "__prev", "__first")
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("__prev") === 0, 0.0)
          .otherwise(round(col("n_users").cast("double") / col("__prev"), 6))
          .as("pct_of_prev"),
        when(col("__first") === 0, 0.0)
          .otherwise(round(col("n_users").cast("double") / col("__first"), 6))
          .as("pct_of_first"))
  }

  /** Per-key exponential moving average (EWMA) over a daily series, in
    * INTEGER micro-units so the recurrence is bit-exact on any engine:
    *
    *   s₀ = v₀·10⁶;  sₜ = (p·vₜ·10⁶ + (q−p)·sₜ₋₁) div q
    *
    * with α = p/q rational (default 3/10). The recurrence is inherently
    * sequential per key, so each key's series is gathered into ONE
    * sorted array (`sort_array(collect_list(...))`) and folded
    * row-locally with the `aggregate` higher-order function — state is
    * bounded by CALENDAR DAYS per key (30–365), never corpus rows, and
    * keys process in parallel after a single group shuffle. Also flags
    * spike days: vₜ·10⁶ > spikeNum/spikeDen · sₜ₋₁ (default 2×).
    *
    * Returns (key, day, v, ewma_ppm, spike).
    */
  def ewmaDaily(daily: DataFrame, keyCol: String, dayCol: String,
      valueCol: String, alphaNum: Long = 3L, alphaDen: Long = 10L,
      spikeNum: Long = 2L, spikeDen: Long = 1L): DataFrame = {
    val p = alphaNum; val q = alphaDen
    val folded = daily
      .groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(col(dayCol).as("day"),
        col(valueCol).cast("long").as("v")))).as("series"))
      .withColumn("acc", expr(
        s"""aggregate(series,
           |  CAST(array() AS array<struct<day:date,v:bigint,s:bigint,prev:bigint>>),
           |  (acc, x) -> array_append(acc, named_struct(
           |    'day', x.day, 'v', x.v,
           |    's', CASE WHEN size(acc) = 0 THEN x.v * 1000000L
           |         ELSE ($p * x.v * 1000000L
           |               + (${q - p}) * element_at(acc, -1).s) div $q END,
           |    'prev', CASE WHEN size(acc) = 0 THEN CAST(NULL AS BIGINT)
           |         ELSE element_at(acc, -1).s END)))""".stripMargin))
      .select(col("key"), explode(col("acc")).as("e"))
    folded.select(col("key"), col("e.day").as("day"), col("e.v").as("v"),
      col("e.s").as("ewma_ppm"),
      (col("e.prev").isNotNull &&
        col("e.v") * lit(1000000L * spikeDen) > lit(spikeNum) * col("e.prev"))
        .as("spike"))
  }

  /** Multi-touch attribution: every conversion event credits the
    * touch events of the same user that precede it within
    * `lookbackSeconds`, under three standard models at once —
    * first-touch, last-touch, and linear (equal split). Credits are
    * INTEGER micro-units (each conversion distributes 10⁶ ppm), so
    * sums are order-free exact; linear's integer division remainder
    * goes to the EARLIEST touch so each conversion's credit sums to
    * exactly 10⁶.
    *
    * Scale shape: one user-keyed join between the (filtered)
    * conversion and touch frames — both filters push to the scan, the
    * shuffle key is the user id, and per-conversion state is the
    * user's touches inside the lookback window (bounded by the
    * window, not history). Ranking inside a conversion's touch set
    * uses a window over (conversion, ts) — partition-bounded by that
    * same window. Returns per-channel (touch event_type) credit
    * totals: (channel, n_touches, first_ppm, last_ppm, linear_ppm).
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, conversionType: String,
      touchTypes: Seq[String], lookbackSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("user"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ts"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("user"), col(idCol).as("touch_id"),
        col(typeCol).as("channel"), col(tsCol).as("touch_ts"))
    val within = conv.join(touch, "user")
      .filter(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") -
          expr(s"INTERVAL $lookbackSeconds SECONDS"))
    val w = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    val ranked = within
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("conv_id")))
    val credited = ranked.select(col("channel"),
      when(col("rk") === 1, 1000000L).otherwise(0L).as("first_ppm"),
      when(col("rk") === col("n"), 1000000L).otherwise(0L).as("last_ppm"),
      // equal split; remainder to the earliest touch so the per-
      // conversion total is exactly 10⁶
      (expr("1000000L div n") +
        when(col("rk") === 1, expr("1000000L % n")).otherwise(0L))
        .as("linear_ppm"))
    credited.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("first_ppm")).as("first_ppm"),
        sum(col("last_ppm")).as("last_ppm"),
        sum(col("linear_ppm")).as("linear_ppm"))
  }

  /** Per-key two-sided CUSUM changepoint detection over a daily series
    * — the sequential-analysis complement of [[ewmaDaily]]'s trend
    * smoothing: EWMA tracks the level, CUSUM accumulates small
    * persistent deviations until they cross a decision threshold, so
    * it catches a sustained 20 % volume shift that never trips a
    * single-day spike or |z|≥2 rule (the failure mode of
    * per-day anomaly checks on drifting pipelines).
    *
    * All state is INTEGER micro-units — bit-exact on any engine:
    *
    *   μ = 10⁶·Σv div n              (the key's own mean level)
    *   slack = μ·slackNum div slackDen,  h = μ·hNum div hDen
    *   s⁺ₜ = max(0, s⁺ₜ₋₁ + (vₜ·10⁶ − μ − slack))
    *   s⁻ₜ = max(0, s⁻ₜ₋₁ + (μ − slack − vₜ·10⁶))
    *   changepoint when s⁺ₜ > h or s⁻ₜ > h; both sides RESET to 0 on
    *   the day after an alarm (the standard restart, so a long shift
    *   reports each sustained excursion once, not every day).
    *
    * Scale shape: the recurrence is inherently sequential per key, so
    * it folds ROW-LOCALLY over one `sort_array(collect_list)` array
    * exactly like [[ewmaDaily]] — state is bounded by calendar days
    * per key, keys parallel after a single group shuffle, and the mean
    * rides the same aggregate (no second pass over the fact table).
    *
    * Returns (key, day, v, cusum_pos, cusum_neg, changepoint).
    */
  def cusumChangepoints(daily: DataFrame, keyCol: String, dayCol: String,
      valueCol: String, slackNum: Long = 1L, slackDen: Long = 4L,
      hNum: Long = 2L, hDen: Long = 1L): DataFrame = {
    val folded = daily
      .groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(col(dayCol).as("day"),
          col(valueCol).cast("long").as("v")))).as("series"),
        expr(s"1000000L * sum(cast($valueCol as bigint)) div count(1)")
          .as("mu"))
      .withColumn("slack", expr(s"mu * $slackNum div $slackDen"))
      .withColumn("h", expr(s"mu * $hNum div $hDen"))
      .withColumn("acc", expr(
        """aggregate(series,
          |  CAST(array() AS
          |    array<struct<day:date,v:bigint,sp:bigint,sn:bigint,cp:boolean>>),
          |  (acc, x) -> array_append(acc, named_struct(
          |    'day', x.day, 'v', x.v,
          |    'sp', greatest(0L,
          |      CASE WHEN size(acc) = 0 OR element_at(acc, -1).cp THEN 0L
          |           ELSE element_at(acc, -1).sp END
          |      + (x.v * 1000000L - mu - slack)),
          |    'sn', greatest(0L,
          |      CASE WHEN size(acc) = 0 OR element_at(acc, -1).cp THEN 0L
          |           ELSE element_at(acc, -1).sn END
          |      + (mu - slack - x.v * 1000000L)),
          |    'cp', greatest(0L,
          |      CASE WHEN size(acc) = 0 OR element_at(acc, -1).cp THEN 0L
          |           ELSE element_at(acc, -1).sp END
          |      + (x.v * 1000000L - mu - slack)) > h
          |      OR greatest(0L,
          |      CASE WHEN size(acc) = 0 OR element_at(acc, -1).cp THEN 0L
          |           ELSE element_at(acc, -1).sn END
          |      + (mu - slack - x.v * 1000000L)) > h)))""".stripMargin))
      .select(col("key"), explode(col("acc")).as("e"))
    folded.select(col("key"), col("e.day").as("day"), col("e.v").as("v"),
      col("e.sp").as("cusum_pos"), col("e.sn").as("cusum_neg"),
      col("e.cp").as("changepoint"))
  }

  /** Trending items: per (day, item), the trailing-`recentDays` count
    * against the preceding-`baselineDays` baseline, scored as an
    * integer rate ratio (score_ppm = 10⁶·recent·baselineDays div
    * max(baseline,1)·recentDays — cross-multiplied, no float), top-n
    * risers per day. The detector behind "what's surging today" over
    * any keyed count stream (query terms, items, document domains).
    *
    * Shape: both windows are calendar RANGE frames over the (item,
    * day) daily-count frame — state ∝ distinct (item, day) cells,
    * never raw events; gaps need no dense grid because a day with no
    * row for an item contributes 0 to every covering window by
    * absence, and only items ACTIVE on the report day (≥ minRecent
    * in-window) are reported. The per-day top-n is the row_number ≤ n
    * shape [[graft.plans.GroupedTopKRule]] rewrites to the
    * bounded-heap exec.
    */
  def trendingItems(daily: DataFrame, itemCol: String, dayCol: String,
                    countCol: String, topN: Int = 5, recentDays: Int = 3,
                    baselineDays: Int = 7, minRecent: Long = 3L): DataFrame = {
    val epoch = datediff(col(dayCol), to_date(lit("1970-01-01")))
    val wr = Window.partitionBy(col(itemCol)).orderBy(epoch)
      .rangeBetween(-(recentDays - 1).toLong, 0L)
    val wb = Window.partitionBy(col(itemCol)).orderBy(epoch)
      .rangeBetween(-(baselineDays + recentDays - 1).toLong,
        -recentDays.toLong)
    val scored = daily
      .withColumn("recent", sum(col(countCol)).over(wr))
      .withColumn("baseline",
        coalesce(sum(col(countCol)).over(wb), lit(0L)))
      .withColumn("score_ppm", expr(
        s"(recent * $baselineDays * 1000000L) div " +
          s"(greatest(baseline, 1L) * $recentDays)"))
      .filter(col("recent") >= minRecent)
    val wd = Window.partitionBy(col(dayCol))
      .orderBy(col("score_ppm").desc, col(itemCol))
    scored.withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= topN)
      .select(col(dayCol).cast("string").as(dayCol), col(itemCol),
        col("recent"), col("baseline"), col("score_ppm"), col("rank"))
  }
}
