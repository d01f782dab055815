package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.Temporal

/** Temporal-join queries over `events`: as-of (latest view before each
  * click, per user) and bucketed range join (clicks inside post-error
  * windows). The oracles use DuckDB's native ASOF JOIN and a plain
  * inequality join respectively — independent formulations of the same
  * semantics, so a hash match validates the union-sort as-of plan and
  * the bucketed range plan end to end.
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val WindowMinutes = 720L
  private val BucketSeconds = 3600L

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  val queries: Map[String, Q] = Map(
    // as-of: each click carries the value of the user's latest view at
    // or before the click; one shuffle on user_id, no join operator
    "q_asof_join" -> ((s, d) => {
      val clicks = ev(s, d).filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      // ties pre-aggregated away: asofJoin requires unique (key, ts)
      val views = ev(s, d).filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max(col("value")).as("view_value"))
      Temporal.asofJoin(clicks, views, Seq("user_id"), "ts",
        Seq("view_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TsFmt).as("click_ts"), col("value"),
          col("asof_view_value"))
        .orderBy("event_id")
    }),

    // forward as-of: each click's NEXT view at-or-after its timestamp
    // (label lookahead — "what happened next")
    "q_asof_forward" -> ((s, d) => {
      val clicks = ev(s, d).filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev(s, d).filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max(col("value")).as("view_value"))
      Temporal.asofJoin(clicks, views, Seq("user_id"), "ts",
        Seq("view_value"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TsFmt).as("click_ts"), col("value"),
          col("asof_view_value"))
        .orderBy("event_id")
    }),

    // range join: clicks falling in the 12 h window after each error
    // of the same user — bucketed equi-join, never an inequality join
    "q_range_join" -> ((s, d) => {
      val clicks = ev(s, d).filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val windows = ev(s, d).filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts").as("w_start"),
          (col("ts") + expr(s"INTERVAL $WindowMinutes MINUTES")).as("w_end"))
      Temporal.rangeJoinBucketed(clicks, windows, Seq("user_id"),
        "ts", "w_start", "w_end", BucketSeconds)
        .select(col("err_id"), col("event_id"), col("user_id"),
          date_format(col("ts"), TsFmt).as("click_ts"))
        .orderBy("err_id", "event_id")
    }),

    // ordered funnel: users completing view → click → purchase with
    // strictly increasing timestamps (earliest-reach greedy semantics)
    "q_funnel" -> ((s, d) =>
      Temporal.funnelSteps(ev(s, d), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), maxGapSeconds = 86400L)
        .orderBy("step")))

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts, c.value,
        |  v.view_value AS asof_view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts, c.value,
        |  v.view_value AS asof_view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts <= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "q_range_join" ->
      s"""WITH clicks AS (SELECT event_id, user_id, ts FROM events
         |  WHERE event_type = 'click'),
         |windows AS (SELECT event_id AS err_id, user_id, ts AS w_start,
         |    ts + INTERVAL $WindowMinutes MINUTE AS w_end FROM events
         |  WHERE event_type = 'error')
         |SELECT w.err_id, c.event_id, c.user_id,
         |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
         |FROM clicks c JOIN windows w
         |  ON c.user_id = w.user_id
         |  AND c.ts >= w.w_start AND c.ts <= w.w_end
         |ORDER BY w.err_id, c.event_id""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |    AND e.ts <= s1.t + INTERVAL 86400 SECONDS
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |    AND e.ts <= s2.t + INTERVAL 86400 SECONDS
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS c1,
        |  (SELECT count(*) FROM s2) AS c2,
        |  (SELECT count(*) FROM s3) AS c3)
        |SELECT step, event_type, n_users,
        |  CASE WHEN prv = 0 THEN 0.0
        |    ELSE round(CAST(n_users AS DOUBLE) / prv, 6) END
        |    AS pct_of_prev,
        |  CASE WHEN fst = 0 THEN 0.0
        |    ELSE round(CAST(n_users AS DOUBLE) / fst, 6) END
        |    AS pct_of_first
        |FROM (
        |  SELECT 1 AS step, 'view' AS event_type, c1 AS n_users,
        |    c1 AS prv, c1 AS fst FROM c
        |  UNION ALL SELECT 2, 'click', c2, c1, c1 FROM c
        |  UNION ALL SELECT 3, 'purchase', c3, c2, c1 FROM c)
        |ORDER BY step""".stripMargin)
}
