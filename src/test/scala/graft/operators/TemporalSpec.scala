package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Exact-value tests for the temporal joins: as-of boundary semantics
  * (equal timestamps match, later rights don't), null behavior for
  * unmatched lefts, and range-join bucket-boundary correctness.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right at-or-before each left, per key") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 09:00:00")), // before any u2 right
      (4L, "u3", ts("2024-01-01 09:00:00"))  // u3 has no rights at all
    ).toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1.0),
      ("u1", ts("2024-01-01 10:00:00"), 2.0), // equal ts → matches id=1
      ("u1", ts("2024-01-01 11:30:00"), 3.0),
      ("u1", ts("2024-01-01 13:00:00"), 9.0), // after both lefts
      ("u2", ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("user", "ts", "v")

    val out = Temporal.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(2.0)), // equal-ts right wins over 09:00's 1.0
      (2L, Some(3.0)), // 11:30 is the latest <= 12:00; 13:00 excluded
      (3L, None),      // u2's only right is later
      (4L, None)))     // no rights for u3
  }

  test("asofJoin forward: earliest right at-or-after each left") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:30:00")), // after all rights → null
      (3L, "u2", ts("2024-01-01 09:00:00"))
    ).toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1.0), // before left 1: excluded
      ("u1", ts("2024-01-01 10:00:00"), 2.0), // equal ts → matches id=1
      ("u1", ts("2024-01-01 11:30:00"), 3.0),
      ("u2", ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("user", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("user"), "ts", Seq("v"),
      direction = "forward")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(2.0)), // equal ts wins over 11:30's 3.0
      (2L, None),      // nothing at-or-after 12:30
      (3L, Some(5.0)))) // u2's only right is later — matched forward
  }

  test("asofJoin: a NULL payload in the latest right row stays NULL") {
    val left = Seq((1L, "u1", ts("2024-01-01 12:00:00")))
      .toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), Some(1.0)),
      ("u1", ts("2024-01-01 11:00:00"), None: Option[Double])) // latest, null v
      .toDF("user", "ts", "v")
    val r = Temporal.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
      .collect()(0)
    // latest-ROW semantics (like DuckDB ASOF): the 11:00 row wins even
    // though its payload is null — 09:00's 1.0 must NOT leak through
    assert(r.isNullAt(r.fieldIndex("asof_v")),
      s"expected null from the latest right row, got $r")
  }

  test("asofJoin carries left payload columns through untouched") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"), "payload"))
      .toDF("id", "user", "ts", "note")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 7.0))
      .toDF("user", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "user", "ts", "note", "asof_v"))
    val r = out.collect()(0)
    assert(r.getAs[String]("note") == "payload")
    assert(r.getAs[Double]("asof_v") == 7.0)
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map { i =>
      (i.toLong, s"u${i % 5}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("pid", "user", "ts")
    val intervals = (1 to 40).map { i =>
      val h = rnd.nextInt(22)
      (i.toLong, s"u${i % 5}",
        ts(f"2024-01-01 $h%02d:00:00"), ts(f"2024-01-01 ${h + 1}%02d:30:00"))
    }.toDF("iid", "user", "w_start", "w_end")

    val bucketed = Temporal.rangeJoinBucketed(points, intervals,
      Seq("user"), "ts", "w_start", "w_end", bucketSeconds = 1800L)
      .select("pid", "iid").collect().map(_.toSeq).toSet
    val naive = points.join(intervals, "user")
      .filter($"ts" >= $"w_start" && $"ts" <= $"w_end")
      .select("pid", "iid").collect().map(_.toSeq).toSet
    assert(bucketed == naive && naive.nonEmpty)
  }

  test("asofJoin plans exactly one shuffle — union-sort, no join operator") {
    val left = (1 to 200).map(i => (i.toLong, s"u${i % 7}",
      ts(f"2024-01-01 ${i % 24}%02d:00:00"))).toDF("id", "user", "ts")
    val right = (1 to 100).map(i => (s"u${i % 7}",
      ts(f"2024-01-01 ${i % 24}%02d:30:00"), i.toDouble))
      .distinct.toDF("user", "ts", "v")
    val plan = Temporal.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 shuffle:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("rangeJoinBucketed plans an equi-join, never a nested loop") {
    val points = (1 to 100).map(i => (i.toLong, s"u${i % 3}",
      ts(f"2024-01-01 ${i % 24}%02d:00:00"))).toDF("pid", "user", "ts")
    val intervals = (1 to 20).map(i => (i.toLong, s"u${i % 3}",
      ts(f"2024-01-01 ${i % 22}%02d:00:00"),
      ts(f"2024-01-01 ${i % 22 + 2}%02d:00:00")))
      .toDF("iid", "user", "w_start", "w_end")
    val plan = Temporal.rangeJoinBucketed(points, intervals, Seq("user"),
      "ts", "w_start", "w_end", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("rangeJoinBucketed: boundary timestamps are inclusive both ends") {
    val points = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")), // == start
      (2L, "u", ts("2024-01-01 11:00:00")), // == end
      (3L, "u", ts("2024-01-01 11:00:01"))  // just past end
    ).toDF("pid", "user", "ts")
    val intervals = Seq(
      (1L, "u", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "user", "w_start", "w_end")
    val got = Temporal.rangeJoinBucketed(points, intervals, Seq("user"),
      "ts", "w_start", "w_end", 600L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("funnelSteps: strict ordering, gap window, earliest-reach greedy") {
    def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000L)
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // user 2: click BEFORE its view — never reaches step 2
      (2L, "click", ts(0)), (2L, "view", ts(10)),
      // user 3: stops after click
      (3L, "view", ts(0)), (3L, "click", ts(10)),
      // user 4: click outside the 60 s gap window
      (4L, "view", ts(0)), (4L, "click", ts(120)),
      // user 5: purchase before its click doesn't count; the later
      // one does (earliest reach AFTER step 2)
      (5L, "view", ts(0)), (5L, "click", ts(10)),
      (5L, "purchase", ts(5)), (5L, "purchase", ts(30)),
    ).toDF("user_id", "event_type", "ts")
    val got = Temporal.funnelSteps(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), maxGapSeconds = 60L)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    // views: users 1,2,3,4,5 → 5; clicks in window after view: 1,3,5
    // → 3; purchases after click: 1,5 → 2
    assert(got.toSeq == Seq((1, 5L, 1.0), (2, 3L, 0.6), (3, 2L, 0.666667)),
      s"got ${got.toSeq}")
  }

  test("retentionCohorts: Monday cohorts, offsets, sizes, ratios") {
    // 2024-01-01 is a Monday; week 2 starts 01-08, week 3 starts 01-15
    val ev = Seq(
      // u1: first event wk1, active wk1 + wk3
      (1L, ts("2024-01-03 10:00:00")), (1L, ts("2024-01-16 10:00:00")),
      // u2: first event wk1 only
      (2L, ts("2024-01-05 10:00:00")),
      // u3: first event wk2, active wk2 + wk3
      (3L, ts("2024-01-08 00:00:00")), (3L, ts("2024-01-20 10:00:00")),
    ).toDF("user_id", "ts")
    val got = Temporal.retentionCohorts(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),   // u1, u2 in their cohort week
      ("2024-01-01", 2, 1L, 2L, 0.5),   // u1 back in week 3
      ("2024-01-08", 0, 1L, 1L, 1.0),   // u3 cohort week
      ("2024-01-08", 1, 1L, 1L, 1.0)),  // u3 back next week
      s"got ${got.toSeq}")
  }

  test("rollingActiveUsers: rolling window distinct, not a sum of DAUs") {
    val ev = Seq(
      // day 1: u1, u2 — day 2: u1 (twice) — day 9: u1 (window reset)
      (1L, ts("2024-01-01 09:00:00")), (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-09 09:00:00")),
    ).toDF("user_id", "ts")
    val got = Temporal.rollingActiveUsers(ev, "user_id", "ts", windowDays = 7)
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 2L),
      // u1 deduplicated across days AND within day 2 → rolling stays 2
      ("2024-01-02", 1L, 2L),
      // day 9: day 1 (u2) fell out of [03..09]; day 2's u1 remains
      ("2024-01-09", 1L, 1L)), s"got ${got.toSeq}")
  }

  test("gapFill: dense spine, per-bucket last value, forward fill") {
    val ev = Seq(
      // u1: events in hours 10 and 13 — hours 11, 12 must be filled
      (1L, 1L, ts("2024-01-01 10:05:00"), 1.5),
      (2L, 1L, ts("2024-01-01 10:55:00"), 2.5), // later in same hour wins
      (3L, 1L, ts("2024-01-01 13:01:00"), 9.0),
      // u2: single event → single bucket, no fill
      (4L, 2L, ts("2024-01-01 00:30:00"), 7.0),
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.gapFill(ev, "user_id", "ts", "value", "event_id")
      .orderBy("user_id", "bucket_ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 10:00:00", 2L, 2.5, true),
      (1L, "2024-01-01 11:00:00", 0L, 2.5, false),
      (1L, "2024-01-01 12:00:00", 0L, 2.5, false),
      (1L, "2024-01-01 13:00:00", 1L, 9.0, true),
      (2L, "2024-01-01 00:00:00", 1L, 7.0, true)), s"got ${got.toSeq}")
  }

  test("eventPatterns: overlapping trigrams per user, global top-k") {
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "b", ts("2024-01-01 10:01:00")),
      (3L, 1L, "c", ts("2024-01-01 10:02:00")),
      (4L, 1L, "d", ts("2024-01-01 10:03:00")),
      (5L, 2L, "a", ts("2024-01-01 11:00:00")),
      (6L, 2L, "b", ts("2024-01-01 11:01:00")),
      (7L, 2L, "c", ts("2024-01-01 11:02:00")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Temporal.eventPatterns(ev, "user_id", "event_type", "ts",
      "event_id", k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "a>b>c", 2L), (2, "b>c>d", 1L)),
      s"got ${got.toSeq}")
  }

  test("anonymizationLadder: finest rung reaching k, else suppress") {
    val ev = Seq(
      // x: 2 events in ONE hour → hour-safe at k=2
      ("x", ts("2024-01-01 10:05:00")), ("x", ts("2024-01-01 10:45:00")),
      // y: 2 events same day, different hours → day
      ("y", ts("2024-01-02 09:00:00")), ("y", ts("2024-01-02 17:00:00")),
      // z: 2 events same month, different days → month
      ("z", ts("2024-01-03 09:00:00")), ("z", ts("2024-01-20 09:00:00")),
      // w: singleton — no rung reaches 2
      ("w", ts("2024-01-04 09:00:00")),
    ).toDF("event_type", "ts")
    val got = Temporal.anonymizationLadder(ev, "event_type", "ts", k = 2L)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("w", "suppress", 1L), ("x", "hour", 2L),
      ("y", "day", 2L), ("z", "month", 2L)), s"got ${got.toSeq}")
  }

  test("gapFill: tie within a bucket resolved by the tie column") {
    val ev = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (11L, 1L, ts("2024-01-01 10:00:00"), 2.0), // same ts, higher tie
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.gapFill(ev, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getDouble(3))
    assert(got.toSeq == Seq(2.0))
  }

  test("asofJoin: a NULL right timestamp matches nothing (no payload leak)") {
    import java.sql.Timestamp
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "ts")
    val right = Seq(
      (1L, Option.empty[Timestamp], "ghost"),   // NULL ts: unmatched ever
      (1L, Option(Timestamp.valueOf("2024-01-01 09:00:00")), "real"))
      .toDF("k", "ts", "p")
    val got = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("p"))
      .select("asof_p").head().getString(0)
    assert(got == "real", s"null-ts right row leaked: got $got")
    // and with ONLY the null-ts row, the left row gets NULL
    val onlyGhost = Temporal.asofJoin(left,
      right.filter($"p" === "ghost"), Seq("k"), "ts", Seq("p"))
      .select("asof_p").head()
    assert(onlyGhost.isNullAt(0), "no matchable right row must yield NULL")
  }

  test("rollingActiveUsers rejects windowDays < 1") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    intercept[IllegalArgumentException] {
      Temporal.rollingActiveUsers(ev, "user_id", "ts", windowDays = 0)
    }
  }

  test("cusumChangepoints: sustained shift fires both sides, resets after alarm") {
    import java.sql.Date
    // 6 days at 100 then 6 at 140 → μ = 120M micro; slack 0, h = μ/2 =
    // 60M. Low side accumulates +20M/day (mean sits above the first
    // half): 20,40,60 (not >h, strict),80 → alarm d4, reset, 20,40.
    // High side from d7: +20M/day → 20,40,60,80 → alarm d10, reset.
    val rows = (1 to 12).map { i =>
      ("a", Date.valueOf(f"2024-01-$i%02d"), if (i <= 6) 100L else 140L)
    }.toDF("key", "day", "v")
    val got = Temporal.cusumChangepoints(rows, "key", "day", "v",
        slackNum = 0L, slackDen = 1L, hNum = 1L, hDen = 2L)
      .orderBy("day").collect()
      .map(r => (r.getDate(1).toString, r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    val cps = got.filter(_._4).map(_._1)
    assert(cps.toSeq == Seq("2024-01-04", "2024-01-10"), got.mkString(", "))
    assert(got(3)._3 == 80000000L)  // d4 cusum_neg at alarm
    assert(got(4)._3 == 20000000L)  // d5 reset → one-day increment only
    assert(got(9)._2 == 80000000L)  // d10 cusum_pos at alarm
  }

  test("cusumChangepoints: a single-day spike never alarms at defaults") {
    import java.sql.Date
    val rows = (1 to 30).map { i =>
      ("a", Date.valueOf(f"2024-01-$i%02d"), if (i == 15) 200L else 100L)
    }.toDF("key", "day", "v")
    val got = Temporal.cusumChangepoints(rows, "key", "day", "v")
      .collect()
    assert(got.forall(!_.getBoolean(5)),
      "isolated spike must not trip CUSUM (that's the spike rule's job)")
  }

  test("anonymizationLadder counts NULL-type events instead of dropping them") {
    import java.sql.Timestamp
    val ev = Seq(
      (Option("click"), Timestamp.valueOf("2024-01-01 10:00:00")),
      (Option("click"), Timestamp.valueOf("2024-01-01 10:10:00")),
      (Option.empty[String], Timestamp.valueOf("2024-01-01 11:00:00")),
      (Option.empty[String], Timestamp.valueOf("2024-01-01 11:30:00")))
      .toDF("event_type", "ts")
    val got = Temporal.anonymizationLadder(ev, "event_type", "ts", k = 2L)
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2)))
    // the 2 NULL-type rows share a day bucket → day rung at k=2;
    // previously they vanished entirely from the report
    assert(got.map(_._3).sum == 4,
      s"every event must be accounted: $got")
    assert(got.exists(r => r._1.isEmpty && r._3 == 2L),
      s"NULL-type rows must appear in the ladder: ${got.toSeq}")
  }

  test("trendingItems: surge outranks steady, integer rate ratio exact") {
    import org.apache.spark.sql.functions._
    val days = (1 to 12).map(d => f"2024-03-$d%02d")
    // A: steady 10/day. B: 1/day baseline, surges to 30/day on the 10th
    val daily = (days.map(d => (d, "A", 10L)) ++
      days.map(d => (d, "B", if (d >= "2024-03-10") 30L else 1L)))
      .toDF("d0", "item", "n")
      .withColumn("day", to_date(col("d0"))).drop("d0")
    val got = Temporal.trendingItems(daily, "item", "day", "n", topN = 1)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(4)))
      .toMap
    // 03-12: B recent = 90, baseline (03-03..03-09) = 7
    //   -> 90·7·10⁶ div (7·3) = 30,000,000; A scores 10⁶ — B wins
    assert(got("2024-03-12") == (("B", 30000000L)), got("2024-03-12"))
    // pre-surge 03-09 both rate-flat at the same score — item tie-break
    assert(got("2024-03-09")._1 == "A", got("2024-03-09"))
  }
}
