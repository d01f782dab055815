package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables

/** Analytic queries over the `events` table — the window / rollup /
  * sessionization / set-op surface the reference lacks entirely
  * (SURVEY.md §2.8 "all absent") but any engine at this scale needs.
  * Batch forms here; graft.streaming holds the incremental forms.
  *
  * Determinism notes: event sums use decimal casts (double sums drift
  * across partition orders); timestamps render as microsecond strings;
  * every window has a total order (ts, event_id tie-break).
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  private val GapMinutes = 30L

  // Tables.events already delivers ts as a microsecond timestamp (the
  // nanos-long conversion happens THERE) — no re-cast here, so nobody
  // mistakes this for the place the conversion happens
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds GapMinutes; session
    * id = running count of session starts. Two windows over one
    * shuffle on user_id.
    */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapMinutes * 60L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  val queries: Map[String, Q] = Map(
    // per-session aggregate: the batch sessionization result
    "q_sessionize" -> ((s, d) =>
      sessionized(s, d)
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
        .orderBy("user_id", "session_seq")),

    // lag/lead/running-sum/moving-avg per user
    "q_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, 0)
      ev(s, d).select(
        col("event_id"), col("user_id"),
        round(lag(col("value"), 1).over(w), 6).as("prev_value"),
        round(lead(col("value"), 1).over(w), 6).as("next_value"),
        sum(col("value").cast(DecimalType(18, 6))).over(run)
          .cast("double").as("running_value"),
        (sum(col("value").cast(DecimalType(18, 6))).over(mov).cast("double")
          / count(lit(1)).over(mov)).as("moving_avg3"))
        .orderBy("event_id")
    }),

    // trailing-5-minute rolling count/sum per user (RANGE frame over
    // event time — uneven spacing, so a ROWS frame can't express it)
    "q_rolling_range" -> ((s, d) =>
      graft.operators.Temporal.rollingByTime(ev(s, d), "user_id", "ts",
        "value", windowSec = 300L)
        .select("event_id", "user_id", "rolling_n", "rolling_sum")
        .orderBy("event_id")),

    // gaps-and-islands: each event opens a 10-minute presence window;
    // overlapping windows merge into maximal islands per user
    "q_interval_merge" -> ((s, d) =>
      graft.operators.Temporal.mergeIntervals(
        ev(s, d).select(col("user_id"), col("ts").as("s"),
          (col("ts") + expr("interval 10 minutes")).as("e")),
        "user_id", "s", "e")
        .select(col("user_id"), col("island_id").cast("long").as("island_id"),
          date_format(col("island_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("island_start"),
          date_format(col("island_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("island_end"),
          col("n_intervals"))
        .orderBy("user_id", "island_id")),

    // SCD2 dimension build: each user's event_type history compressed
    // to validity intervals (open interval → null valid_to)
    "q_scd2" -> ((s, d) =>
      graft.operators.Temporal.scd2(ev(s, d), "user_id", "ts",
        "event_type", "event_id")
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("valid_to"))
        .orderBy("user_id", "valid_from", "event_type")),

    // ranking-function family over one total-ordered window: rank /
    // dense_rank / ntile quartiles / percent_rank / cume_dist (ties on
    // value are real — value is discretized to cents so rank vs
    // dense_rank actually diverge)
    "q_rank_funcs" -> ((s, d) => {
      // value floored to whole units so ties are REAL (rank vs
      // dense_rank diverge); rank/dense_rank/percent_rank/cume_dist
      // are tie-stable, so the non-total order is still deterministic
      val tied = Window.partitionBy("event_type")
        .orderBy(floor(col("value")).asc)
      // ntile depends on row POSITION, so it gets a total order
      val total = Window.partitionBy("event_type")
        .orderBy(col("value").asc, col("event_id").asc)
      ev(s, d).select(
        col("event_id"), col("event_type"),
        rank().over(tied).as("rnk"),
        dense_rank().over(tied).as("drnk"),
        ntile(4).over(total).as("quartile"),
        round(percent_rank().over(tied), 6).as("pct_rank"),
        round(cume_dist().over(tied), 6).as("cume"))
        .orderBy("event_id")
    }),

    // rollup: event_type × day hierarchy with subtotals
    "q_rollup" -> ((s, d) =>
      ev(s, d)
        .select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("value"))
        .rollup("event_type", "day")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)),

    // explicit GROUPING SETS (the rollup/cube sibling): per-type,
    // per-day, and grand-total — but NOT the (type, day) cross, which
    // rollup/cube can't express; grouping_id disambiguates the null
    // that means "aggregated over" from a real null
    "q_grouping_sets" -> ((s, d) => {
      ev(s, d).select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
        .createOrReplaceTempView("ev_gs")
      s.sql("""
        SELECT event_type, day,
          CAST(grouping_id(event_type, day) AS INT) AS gid,
          count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (day), ())
        ORDER BY gid, event_type NULLS LAST, day NULLS LAST""")
    }),

    // cube over event_type × device-ish bucket
    "q_cube" -> ((s, d) =>
      ev(s, d)
        .select(col("event_type"), (col("user_id") % 10).as("user_bucket"),
          col("value"))
        .cube("event_type", "user_bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first,
          col("user_bucket").asc_nulls_first)),

    // fixed-bound equi-width histogram of value per event type —
    // one-pass profiling (no min/max pre-scan)
    "q_histogram" -> ((s, d) =>
      graft.operators.Features.histogram(ev(s, d), "value", "event_type",
        lo = -5.0, hi = 5.0, nBuckets = 10)
        .orderBy("event_type", "bucket")),

    // wide → long reshape: per-flag aggregate unpivoted to
    // (key, metric, value) triples — the melt half of the pivot pair
    "q_unpivot" -> ((s, d) => {
      val wide = ev(s, d).groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sum_value"))
      wide.unpivot(Array(col("event_type")),
        Array(col("n_events"), col("sum_value")), "metric", "value")
        .withColumn("value", round(col("value"), 6))
        .orderBy("event_type", "metric")
    }),

    // exact percentiles per event type
    "q_percentile" -> ((s, d) =>
      ev(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy("event_type")),

    // deterministic arg-max: highest-value event per user
    "q_argmax" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id").desc)
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("top_event_id"),
          col("event_type").as("top_event_type"),
          round(col("value"), 6).as("top_value"))
        .orderBy("user_id")
    }),

    // set ops: users with clicks but no errors (EXCEPT), and both (INTERSECT)
    "q_setop" -> ((s, d) => {
      val e = ev(s, d)
      // persisted: each distinct set feeds both EXCEPT and INTERSECT
      val clickers = e.filter(col("event_type") === "click")
        .select("user_id").distinct().persist()
      val erronious = e.filter(col("event_type") === "error")
        .select("user_id").distinct().persist()
      clickers.except(erronious).withColumn("cohort", lit("click_no_error"))
        .unionByName(
          clickers.intersect(erronious).withColumn("cohort", lit("click_and_error")))
        .orderBy("cohort", "user_id")
    }),

    // trending detector: per day, the top-5 items whose trailing-3-day
    // count surges over their preceding-7-day baseline — integer rate
    // ratio over calendar range-frame windows on the (item, day)
    // daily-count cells, per-day top-k through the GroupedTopK shape
    "q_trending" -> ((s, d) => {
      val daily = ev(s, d)
        .select(to_date(col("ts")).as("day"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull)
        .groupBy("day", "item").agg(count(lit(1)).as("n"))
      graft.operators.Temporal.trendingItems(daily, "item", "day", "n")
        .orderBy("day", "rank")
    }),

    // JSON extraction from the props column
    "q_json" -> ((s, d) =>
      ev(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // per-type z-score standardization (tiny stats frame broadcast
    // back — the facts are never shuffled)
    "q_zscore" -> ((s, d) =>
      graft.operators.Features.zscoreByGroup(ev(s, d), "value", "event_type")
        .select("event_id", "event_type", "zscore")
        .orderBy("event_id")),

    // per-type winsorization into the [p01, p99] band
    "q_winsorize" -> ((s, d) =>
      graft.operators.Features.winsorizeByGroup(ev(s, d), "value",
        "event_type")
        .select("event_id", "event_type", "winsorized")
        .orderBy("event_id")),

    // cohort retention matrix: first-event week × week offset
    "q_retention" -> ((s, d) =>
      graft.operators.Temporal.retentionCohorts(ev(s, d), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),

    // exact DAU + trailing-7-day rolling distinct users per day
    "q_active_users" -> ((s, d) =>
      graft.operators.Temporal.rollingActiveUsers(ev(s, d), "user_id", "ts",
        windowDays = 7)
        .orderBy("day")),

    // dense hourly resample per user with forward fill
    "q_gap_fill" -> ((s, d) =>
      graft.operators.Temporal.gapFill(ev(s, d), "user_id", "ts", "value",
        "event_id", stepSeconds = 3600L)
        .orderBy("user_id", "bucket_ts")),

    // top-20 frequent 3-step behavior patterns across users
    "q_event_patterns" -> ((s, d) =>
      graft.operators.Temporal.eventPatterns(ev(s, d), "user_id",
        "event_type", "ts", "event_id", k = 20)
        .orderBy("rk")),

    // Markov transition matrix: per-user consecutive event-type pairs,
    // row-normalized in integer ppm (truncating div ≡ both engines) —
    // the 1-step sibling of q_event_patterns' trigram mining
    "q_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = ev(s, d)
        .withColumn("__next", lead(col("event_type"), 1).over(w))
        .filter(col("__next").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("__next").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("from_type")
        .agg(sum(col("n")).as("__tot"))
      pairs.join(totals, "from_type")
        .withColumn("p_ppm", expr("1000000 * n div __tot"))
        .select("from_type", "to_type", "n", "p_ppm")
        .orderBy("from_type", "to_type")
    }),

    // k-anonymity generalization ladder (hour→day→month, k=5)
    "q_kanon_ladder" -> ((s, d) =>
      graft.operators.Temporal.anonymizationLadder(ev(s, d), "event_type",
        "ts", k = 5L)
        .orderBy("event_type", "granularity")),

    // daily-volume anomaly days: |z| >= 2 vs the type's own day curve
    "q_volume_anomaly" -> ((s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Features.zscoreByGroup(daily, "n", "event_type")
        .filter(abs(col("zscore")) >= 2)
        .select("event_type", "day", "n", "zscore")
        .orderBy("event_type", "day")
    }),

    // bit-reproducible Pearson correlation between event-type activity
    // counts across users (integer sufficient statistics)
    "q_correlation" -> ((s, d) =>
      graft.operators.Features.pairwiseCorrelation(ev(s, d), "user_id",
        "event_type")
        .orderBy("type_a", "type_b")),

    // hash-armed A/B readout: Welch's t over the value metric
    "q_abtest" -> ((s, d) =>
      graft.operators.Features.abTest(ev(s, d), "user_id", "value")),

    // cumulative unique-user growth curve: new users by first-event
    // day + running total (the global window runs over the days-sized
    // frame — bounded by the calendar, never by events)
    "q_user_growth" -> ((s, d) => {
      val daily = ev(s, d).groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("__d"))
        .groupBy("__d").agg(count(lit(1)).as("new_users"))
      daily
        .withColumn("cumulative_users",
          sum(col("new_users")).over(Window.orderBy("__d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(date_format(col("__d"), "yyyy-MM-dd").as("day"),
          col("new_users"), col("cumulative_users"))
        .orderBy("day")
    }),

    // robust MAD outliers: |x − median| > 3·MAD per event type
    "q_mad_outliers" -> ((s, d) =>
      graft.operators.Features.madOutliers(ev(s, d), "value", "event_type",
        k = 3.0)
        .select("event_id", "event_type",
          "value", "deviation", "cutoff")
        .withColumn("value", round(col("value"), 6))
        .orderBy("event_id")),

    // day-of-week seasonality profile per event type (ISO dow)
    "q_dow_profile" -> ((s, d) =>
      ev(s, d)
        .groupBy(col("event_type"), (weekday(col("ts")) + 1).as("dow"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sum_value"))
        .orderBy("event_type", "dow")),

    // integer EWMA trend per event type over the daily count series,
    // with 2x spike flags (sequential recurrence folded row-locally
    // per key — state bounded by calendar days, never corpus rows)
    "q_ewma" -> ((s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Temporal.ewmaDaily(daily, "event_type", "day", "n")
        .select(col("key"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("v"), col("ewma_ppm"), col("spike"))
        .orderBy("key", "day")
    }),

    // two-sample Kolmogorov–Smirnov drift per event type: did the
    // VALUE distribution shift between the month's halves? Exact
    // integer ECDF arithmetic (10⁶·max|ca·nb − cb·na| div na·nb)
    "q_ks_drift" -> ((s, d) =>
      graft.operators.Features.ksDrift(
        ev(s, d).withColumn("half",
          when(dayofmonth(col("ts")) <= 15, "h1").otherwise("h2")),
        "event_type", "half", "h1", "h2", "value")
        .orderBy("group")),

    // two-sided CUSUM changepoints per event type over the daily count
    // series: sustained small shifts accumulate until they cross
    // h = 2μ (catches drifts that never trip a spike or z-score rule);
    // integer micro-unit recurrence folded row-locally per key
    "q_changepoint" -> ((s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Temporal.cusumChangepoints(daily, "event_type",
          "day", "n")
        .select(col("key"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("v"), col("cusum_pos"), col("cusum_neg"), col("changepoint"))
        .orderBy("key", "day")
    }),

    // multi-touch attribution: purchases credit view/click touches in
    // the trailing 7 days under first/last/linear models (ppm units)
    "q_attribution" -> ((s, d) =>
      graft.operators.Temporal.attribution(ev(s, d), "user_id",
        "event_type", "ts", "event_id", conversionType = "purchase",
        touchTypes = Seq("view", "click"), lookbackSeconds = 7L * 86400L)
        .orderBy("channel")),
  )

  val oracleSql: Map[String, String] = Map(
    "q_ks_drift" ->
      """WITH pts AS (SELECT event_type AS grp, value AS v,
        |    CAST(sum(CASE WHEN date_part('day', ts) <= 15
        |      THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN date_part('day', ts) > 15
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT grp, v,
        |    sum(na) OVER (PARTITION BY grp ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS ca,
        |    sum(nb) OVER (PARTITION BY grp ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cb,
        |    sum(na) OVER (PARTITION BY grp) AS ta,
        |    sum(nb) OVER (PARTITION BY grp) AS tb
        |  FROM pts)
        |SELECT grp AS "group", CAST(ta AS BIGINT) AS n_a,
        |  CAST(tb AS BIGINT) AS n_b,
        |  CASE WHEN ta = 0 OR tb = 0 THEN NULL
        |    ELSE CAST(1000000 * max(abs(ca * tb - cb * ta)) // (ta * tb)
        |      AS BIGINT) END AS ks_ppm
        |FROM c GROUP BY grp, ta, tb ORDER BY "group"""".stripMargin,

    "q_changepoint" ->
      """WITH RECURSIVE d AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT key,
        |    CAST(1000000 * sum(v) // count(*) AS BIGINT) AS mu,
        |    CAST((1000000 * sum(v) // count(*)) * 1 // 4 AS BIGINT) AS slack,
        |    CAST((1000000 * sum(v) // count(*)) * 2 // 1 AS BIGINT) AS h
        |  FROM d GROUP BY 1),
        |i AS (SELECT d.key, day, v, mu, slack, h,
        |    row_number() OVER (PARTITION BY d.key ORDER BY day) AS rn
        |  FROM d JOIN p ON d.key = p.key),
        |r AS (
        |  SELECT key, day, v, rn, mu, slack, h,
        |    greatest(0, v * 1000000 - mu - slack) AS sp,
        |    greatest(0, mu - slack - v * 1000000) AS sn,
        |    (greatest(0, v * 1000000 - mu - slack) > h
        |     OR greatest(0, mu - slack - v * 1000000) > h) AS cp
        |  FROM i WHERE rn = 1
        |  UNION ALL
        |  SELECT i.key, i.day, i.v, i.rn, i.mu, i.slack, i.h,
        |    greatest(0, CASE WHEN r.cp THEN 0 ELSE r.sp END
        |      + (i.v * 1000000 - i.mu - i.slack)) AS sp,
        |    greatest(0, CASE WHEN r.cp THEN 0 ELSE r.sn END
        |      + (i.mu - i.slack - i.v * 1000000)) AS sn,
        |    (greatest(0, CASE WHEN r.cp THEN 0 ELSE r.sp END
        |      + (i.v * 1000000 - i.mu - i.slack)) > i.h
        |     OR greatest(0, CASE WHEN r.cp THEN 0 ELSE r.sn END
        |      + (i.mu - i.slack - i.v * 1000000)) > i.h) AS cp
        |  FROM i JOIN r ON i.key = r.key AND i.rn = r.rn + 1)
        |SELECT key, strftime(day, '%Y-%m-%d') AS day, v,
        |  CAST(sp AS BIGINT) AS cusum_pos, CAST(sn AS BIGINT) AS cusum_neg,
        |  cp AS changepoint
        |FROM r ORDER BY key, day""".stripMargin,

    "q_ewma" ->
      """WITH RECURSIVE d AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |i AS (SELECT key, day, v,
        |    row_number() OVER (PARTITION BY key ORDER BY day) AS rn
        |  FROM d),
        |r AS (
        |  SELECT key, day, v, rn, CAST(v * 1000000 AS BIGINT) AS s,
        |    CAST(NULL AS BIGINT) AS prev
        |  FROM i WHERE rn = 1
        |  UNION ALL
        |  SELECT i.key, i.day, i.v, i.rn,
        |    CAST((3 * i.v * 1000000 + 7 * r.s) // 10 AS BIGINT) AS s,
        |    r.s AS prev
        |  FROM i JOIN r ON i.key = r.key AND i.rn = r.rn + 1)
        |SELECT key, strftime(day, '%Y-%m-%d') AS day, v, s AS ewma_ppm,
        |  prev IS NOT NULL AND v * 1000000 > 2 * prev AS spike
        |FROM r ORDER BY key, day""".stripMargin,

    "q_attribution" ->
      """WITH c AS (SELECT user_id AS u, event_id AS conv_id, ts AS cts
        |    FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS u, event_id AS tid, event_type AS channel,
        |    ts AS tts
        |  FROM events WHERE event_type IN ('view', 'click')),
        |w AS (SELECT c.conv_id, t.tid, t.channel, t.tts
        |  FROM c JOIN t USING (u)
        |  WHERE t.tts < c.cts AND t.tts >= c.cts - INTERVAL 7 DAY),
        |r AS (SELECT conv_id, channel,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY tts, tid) AS rk,
        |    count(*) OVER (PARTITION BY conv_id) AS n
        |  FROM w)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(CASE WHEN rk = 1 THEN 1000000 ELSE 0 END) AS BIGINT)
        |    AS first_ppm,
        |  CAST(sum(CASE WHEN rk = n THEN 1000000 ELSE 0 END) AS BIGINT)
        |    AS last_ppm,
        |  CAST(sum(1000000 // n
        |    + CASE WHEN rk = 1 THEN 1000000 % n ELSE 0 END) AS BIGINT)
        |    AS linear_ppm
        |FROM r GROUP BY 1 ORDER BY channel""".stripMargin,
    "q_sessionize" ->
      s"""WITH ordered AS (
         |  SELECT *, lag(epoch_us(ts)) OVER w AS prev_us,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapMinutes * 60000000L}
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |sess AS (
         |  SELECT *, sum(new_sess) OVER (
         |    PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
         |    ROWS UNBOUNDED PRECEDING) AS session_seq
         |  FROM ordered)
         |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         |  count(*) AS n_events,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         |FROM sess GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin,

    "q_window_funcs" ->
      """SELECT event_id, user_id,
        |  round(lag(value) OVER w, 6) AS prev_value,
        |  round(lead(value) OVER w, 6) AS next_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER m AS DOUBLE)
        |       / count(*) OVER m AS moving_avg3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST),
        |       m AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_interval_merge" ->
      """WITH iv AS (SELECT user_id, ts AS s,
        |    ts + INTERVAL 10 MINUTE AS e FROM events),
        |f AS (SELECT user_id, s, e,
        |    CASE WHEN max(epoch_us(e)) OVER pm IS NULL
        |           OR epoch_us(s) > max(epoch_us(e)) OVER pm
        |         THEN 1 ELSE 0 END AS ni
        |  FROM iv
        |  WINDOW pm AS (PARTITION BY user_id
        |    ORDER BY s NULLS FIRST, e NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (SELECT user_id, s, e,
        |    sum(ni) OVER (PARTITION BY user_id
        |      ORDER BY s NULLS FIRST, e NULLS FIRST
        |      ROWS UNBOUNDED PRECEDING) AS island_id
        |  FROM f)
        |SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
        |  strftime(min(s), '%Y-%m-%d %H:%M:%S.%f') AS island_start,
        |  strftime(max(e), '%Y-%m-%d %H:%M:%S.%f') AS island_end,
        |  count(*) AS n_intervals
        |FROM g GROUP BY user_id, island_id
        |ORDER BY user_id, island_id""".stripMargin,

    "q_scd2" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |iv AS (SELECT user_id, event_type, ts AS vf,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS vt
        |  FROM ch)
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to
        |FROM iv ORDER BY user_id, valid_from, event_type""".stripMargin,

    "q_rank_funcs" ->
      """SELECT event_id, event_type,
        |  CAST(rank() OVER t AS INT) AS rnk,
        |  CAST(dense_rank() OVER t AS INT) AS drnk,
        |  CAST(ntile(4) OVER o AS INT) AS quartile,
        |  round(percent_rank() OVER t, 6) AS pct_rank,
        |  round(cume_dist() OVER t, 6) AS cume
        |FROM events
        |WINDOW t AS (PARTITION BY event_type ORDER BY floor(value)),
        |       o AS (PARTITION BY event_type
        |             ORDER BY value NULLS FIRST, event_id NULLS FIRST)
        |ORDER BY event_id""".stripMargin,

    "q_rolling_range" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS rolling_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |    AS rolling_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(grouping(event_type, strftime(ts, '%Y-%m-%d')) AS INT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (strftime(ts, '%Y-%m-%d')), ())
        |ORDER BY gid, event_type NULLS LAST, day NULLS LAST""".stripMargin,

    "q_cube" ->
      """SELECT event_type, user_id % 10 AS user_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY CUBE(event_type, user_id % 10)
        |ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin,

    "q_histogram" ->
      """WITH b AS (SELECT event_type,
        |    CAST(least(greatest(floor((value - (-5.0)) / 1.0), 0.0), 9.0)
        |         AS INT) AS bucket
        |  FROM events)
        |SELECT event_type, bucket, count(*) AS n,
        |  round(-5.0 + bucket * 1.0, 6) AS bucket_lo,
        |  round(-5.0 + (bucket + 1) * 1.0, 6) AS bucket_hi
        |FROM b GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (SELECT event_type,
        |    CAST(count(*) AS DOUBLE) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY event_type)
        |SELECT event_type, metric, round(value, 6) AS value FROM (
        |  SELECT event_type, 'n_events' AS metric, n_events AS value
        |    FROM wide
        |  UNION ALL
        |  SELECT event_type, 'sum_value', sum_value FROM wide)
        |ORDER BY event_type, metric""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_argmax" ->
      """SELECT user_id, event_id AS top_event_id,
        |  event_type AS top_event_type, round(value, 6) AS top_value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY value DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "q_setop" ->
      """WITH clickers AS (SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'click'),
        |err AS (SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'error')
        |SELECT user_id, 'click_no_error' AS cohort
        |FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM err)
        |UNION ALL
        |SELECT user_id, 'click_and_error' AS cohort
        |FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM err)
        |ORDER BY cohort, user_id""".stripMargin,

    "q_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_trending" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    count(*) AS n
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  GROUP BY 1, 2),
        |sc AS (SELECT day, item, n,
        |    sum(n) OVER (PARTITION BY item
        |      ORDER BY date_diff('day', DATE '1970-01-01', day)
        |      RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS recent,
        |    coalesce(sum(n) OVER (PARTITION BY item
        |      ORDER BY date_diff('day', DATE '1970-01-01', day)
        |      RANGE BETWEEN 9 PRECEDING AND 3 PRECEDING), 0) AS baseline
        |  FROM daily),
        |r AS (SELECT day, item, recent, baseline,
        |    (recent * 7 * 1000000) // (greatest(baseline, 1) * 3)
        |      AS score_ppm
        |  FROM sc WHERE recent >= 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY day
        |    ORDER BY score_ppm DESC, item) AS rank FROM r)
        |SELECT CAST(day AS VARCHAR) AS day, item,
        |  CAST(recent AS BIGINT) AS recent,
        |  CAST(baseline AS BIGINT) AS baseline,
        |  CAST(score_ppm AS BIGINT) AS score_ppm,
        |  CAST(rank AS INT) AS rank
        |FROM rk WHERE rank <= 5
        |ORDER BY day, rank""".stripMargin,

    "q_zscore" ->
      """WITH s AS (SELECT event_type, avg(value) AS mu,
        |    stddev_samp(value) AS sd
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - s.mu) / s.sd, 6) AS zscore
        |FROM events e
        |JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
        |ORDER BY e.event_id""".stripMargin,

    "q_winsorize" ->
      """WITH s AS (SELECT event_type,
        |    quantile_cont(value, 0.01) AS lo,
        |    quantile_cont(value, 0.99) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  round(greatest(s.lo, least(s.hi, e.value)), 6) AS winsorized
        |FROM events e
        |JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
        |ORDER BY e.event_id""".stripMargin,

    "q_retention" ->
      """WITH fw AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |    FROM events GROUP BY 1),
        |aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |    FROM events),
        |j AS (SELECT a.user_id, f.cohort,
        |    CAST(date_diff('day', f.cohort, a.wk) // 7 AS INT) AS week_offset
        |  FROM aw a JOIN fw f USING (user_id)),
        |n AS (SELECT cohort, week_offset, count(*) AS n_active
        |  FROM j GROUP BY 1, 2),
        |cs AS (SELECT cohort, count(*) AS cohort_size FROM fw GROUP BY 1)
        |SELECT strftime(n.cohort, '%Y-%m-%d') AS cohort_week, n.week_offset,
        |  n.n_active, cs.cohort_size,
        |  round(CAST(n.n_active AS DOUBLE) / cs.cohort_size, 6)
        |    AS retention_pct
        |FROM n JOIN cs USING (cohort)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q_active_users" ->
      """WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |    FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY 1),
        |contrib AS (SELECT DISTINCT day + CAST(gs.x AS INTEGER) AS tday,
        |    user_id
        |  FROM daily CROSS JOIN
        |    (SELECT unnest(generate_series(0, 6)) AS x) gs),
        |rolling AS (SELECT tday, count(*) AS rolling_users
        |  FROM contrib GROUP BY 1)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, r.rolling_users
        |FROM dau d JOIN rolling r ON r.tday = d.day
        |ORDER BY day""".stripMargin,

    "q_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value,
        |    abs(e.value - med.m) AS ad
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_id, d.event_type, round(d.value, 6) AS value,
        |  round(d.ad, 6) AS deviation, round(3.0 * mad.mad, 6) AS cutoff
        |FROM dev d JOIN mad USING (event_type)
        |WHERE round(d.ad, 6) > round(3.0 * mad.mad, 6)
        |ORDER BY d.event_id""".stripMargin,

    "q_dow_profile" ->
      """SELECT event_type, CAST(isodow(ts) AS INT) AS dow,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, dow""".stripMargin,

    "q_abtest" -> {
      val bucket =
        s"${graft.functions.Portable.hash32Sql("CAST(user_id AS VARCHAR)")} % 100"
      s"""WITH e AS (SELECT ($bucket) % 2 AS arm, value FROM events),
         |a AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |    CAST(sum(CASE WHEN arm = 0
         |      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sa,
         |    CAST(sum(CASE WHEN arm = 1
         |      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sb,
         |    CAST(sum(CASE WHEN arm = 0
         |      THEN CAST(value AS DECIMAL(18,6))
         |         * CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS qa,
         |    CAST(sum(CASE WHEN arm = 1
         |      THEN CAST(value AS DECIMAL(18,6))
         |         * CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS qb
         |  FROM e)
         |SELECT na, nb, round(sa / na, 6) AS mean_a,
         |  round(sb / nb, 6) AS mean_b,
         |  round((sa / na - sb / nb) / sqrt(
         |    ((qa - sa * sa / na) / (na - 1)) / na
         |    + ((qb - sb * sb / nb) / (nb - 1)) / nb), 6) AS t,
         |  abs(round((sa / na - sb / nb) / sqrt(
         |    ((qa - sa * sa / na) / (na - 1)) / na
         |    + ((qb - sb * sb / nb) / (nb - 1)) / nb), 6)) >= 1.96
         |    AS significant
         |FROM a""".stripMargin
    },

    "q_user_growth" ->
      """WITH fd AS (SELECT user_id, CAST(min(ts) AS DATE) AS d
        |  FROM events GROUP BY 1),
        |daily AS (SELECT d, count(*) AS new_users FROM fd GROUP BY 1)
        |SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY d
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
        |FROM daily ORDER BY day""".stripMargin,

    "q_transitions" ->
      """WITH o AS (SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS nxt
        |  FROM events),
        |p AS (SELECT event_type AS from_type, nxt AS to_type,
        |    count(*) AS n
        |  FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
        |  FROM p GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n,
        |  CAST(1000000 * p.n // t.tot AS BIGINT) AS p_ppm
        |FROM p JOIN t USING (from_type)
        |ORDER BY p.from_type, p.to_type""".stripMargin,

    "q_volume_anomaly" ->
      """WITH dayc AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
        |  FROM dayc GROUP BY 1)
        |SELECT d.event_type, d.day, d.n,
        |  round((d.n - s.mu) / s.sd, 6) AS zscore
        |FROM dayc d JOIN s USING (event_type)
        |WHERE abs(round((d.n - s.mu) / s.sd, 6)) >= 2
        |ORDER BY d.event_type, d.day""".stripMargin,

    "q_correlation" ->
      """WITH counts AS (SELECT user_id AS e, event_type AS t,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ents AS (SELECT DISTINCT user_id AS e FROM events),
        |typs AS (SELECT DISTINCT event_type AS t FROM events),
        |dense AS (SELECT ents.e, typs.t, coalesce(counts.n, 0) AS n
        |  FROM ents CROSS JOIN typs
        |  LEFT JOIN counts ON counts.e = ents.e AND counts.t = typs.t),
        |p AS (SELECT a.e, a.t AS type_a, b.t AS type_b, a.n AS x, b.n AS y
        |  FROM dense a JOIN dense b ON b.e = a.e WHERE a.t < b.t),
        |agg AS (SELECT type_a, type_b, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM p GROUP BY 1, 2)
        |SELECT type_a, type_b, n,
        |  CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0 THEN NULL
        |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS r
        |FROM agg ORDER BY type_a, type_b""".stripMargin,

    "q_event_patterns" ->
      """WITH o AS (SELECT event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
        |p AS (SELECT event_type || '>' || t1 || '>' || t2 AS pattern
        |  FROM o WHERE t2 IS NOT NULL),
        |c AS (SELECT pattern, count(*) AS n FROM p GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY n DESC, pattern) AS rk
        |  FROM c)
        |SELECT CAST(rk AS INT) AS rk, pattern, n
        |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,

    "q_kanon_ladder" ->
      """WITH e AS (SELECT event_type,
        |    date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
        |    date_trunc('month', ts) AS m
        |  FROM events),
        |hs AS (SELECT event_type, h, count(*) AS nh FROM e GROUP BY 1, 2),
        |ds AS (SELECT event_type, d, count(*) AS nd FROM e GROUP BY 1, 2),
        |ms AS (SELECT event_type, m, count(*) AS nm FROM e GROUP BY 1, 2),
        |lad AS (SELECT e.event_type,
        |    CASE WHEN hs.nh >= 5 THEN 'hour'
        |         WHEN ds.nd >= 5 THEN 'day'
        |         WHEN ms.nm >= 5 THEN 'month'
        |         ELSE 'suppress' END AS granularity
        |  FROM e
        |  JOIN hs ON hs.event_type = e.event_type AND hs.h = e.h
        |  JOIN ds ON ds.event_type = e.event_type AND ds.d = e.d
        |  JOIN ms ON ms.event_type = e.event_type AND ms.m = e.m)
        |SELECT event_type, granularity, count(*) AS n_events
        |FROM lad GROUP BY 1, 2
        |ORDER BY event_type, granularity""".stripMargin,

    "q_gap_fill" ->
      """WITH e AS (SELECT *, epoch_us(ts) // 3600000000 AS h FROM events),
        |lastb AS (SELECT user_id, h, value AS v, n FROM (
        |    SELECT user_id, h, value,
        |      row_number() OVER (PARTITION BY user_id, h
        |        ORDER BY ts DESC, event_id DESC) AS rn,
        |      count(*) OVER (PARTITION BY user_id, h) AS n
        |    FROM e) WHERE rn = 1),
        |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1
        |  FROM e GROUP BY 1),
        |sp AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h
        |  FROM bounds),
        |f AS (SELECT sp.user_id, sp.h, lastb.v, lastb.n FROM sp
        |  LEFT JOIN lastb ON lastb.user_id = sp.user_id AND lastb.h = sp.h),
        |filled AS (SELECT *, last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS fv
        |  FROM f)
        |SELECT user_id,
        |  strftime(epoch_ms(h * 3600000), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
        |  coalesce(n, 0) AS n_events, round(fv, 6) AS filled_value,
        |  v IS NOT NULL AS observed
        |FROM filled ORDER BY user_id, bucket_ts""".stripMargin,
  )
}
