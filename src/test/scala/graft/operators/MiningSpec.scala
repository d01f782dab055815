package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ---- frequentPairs -------------------------------------------------

  test("frequentPairs: exact supports, confidence and lift in ppm") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{a,c} 5:{b} 6:{d}
    val df = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "b"),
      (4, "a"), (4, "c"),
      (5, "b"), (6, "d"),
      (2, "a") // duplicate (basket,item) row — must not inflate supports
    ).toDF("basket", "item")
    val out = Mining.frequentPairs(df, "basket", "item",
      minItemSupport = 2L, minPairSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // supp: a=4 b=4 c=2, d=1 pruned; pairs: (a,b)=3, (a,c)=2, (b,c)=1 cut
    assert(out.keySet == Set(("a", "b"), ("a", "c")))
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 3 && ab.getLong(3) == 4 && ab.getLong(4) == 4)
    assert(ab.getLong(5) == 750000L) // conf a→b = 3/4
    assert(ab.getLong(6) == 750000L)
    // lift = 1e6·3·6 div (4·4) = 1_125_000 (6 distinct baskets)
    assert(ab.getLong(7) == 1125000L)
    val ac = out(("a", "c"))
    assert(ac.getLong(2) == 2 && ac.getLong(5) == 500000L)
    assert(ac.getLong(6) == 1000000L) // conf c→a = 2/2
    assert(ac.getLong(7) == 1500000L) // 1e6·2·6 div 8
  }

  test("frequentPairs: downward closure prunes before the pair join") {
    // item 'z' co-occurs everywhere but is below minItemSupport=3 —
    // no pair containing it may appear
    val df = Seq((1, "a"), (1, "z"), (2, "a"), (2, "z"), (3, "a"))
      .toDF("basket", "item")
    val out = Mining.frequentPairs(df, "basket", "item", 3L, 1L).collect()
    assert(out.isEmpty)
  }

  // ---- skyline2d -----------------------------------------------------

  /** brute-force dominance oracle */
  private def bruteSkyline(pts: Seq[(Double, Int)]): Set[(Double, Int)] =
    pts.filterNot { p =>
      pts.exists(q => q._1 <= p._1 && q._2 >= p._2 &&
        (q._1 < p._1 || q._2 > p._2))
    }.toSet

  test("skyline2d matches the brute-force dominance definition") {
    val pts = Seq(
      (900.0, 10), (900.0, 10), // duplicates both survive
      (905.0, 12), (905.0, 11), // 11 dominated by same-price 12
      (910.0, 12),              // dominated by (905, 12)
      (950.0, 30), (980.0, 31), (990.0, 31), // (990,31) dominated
      (999.0, 50))
    val df = pts.zipWithIndex
      .map { case ((p, s), i) => (i.toLong, p, s) }
      .toDF("id", "price", "size")
    val got = Mining.skyline2d(df, "price", "size")
      .select("price", "size").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val want = bruteSkyline(pts)
    assert(got.toSet == want)
    // duplicates: both (900,10) rows kept
    assert(got.count(_ == (900.0, 10)) == 2)
  }

  test("skyline2d agrees with brute force on the part table") {
    val part = spark.read.parquet(s"$sf/part.parquet")
    val pts = part.select("p_retailprice", "p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSeq
    val got = Mining.skyline2d(part, "p_retailprice", "p_size")
      .select("p_retailprice", "p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSet
    assert(got == bruteSkyline(pts))
  }

  test("skyline2d bucket prune keeps every true skyline row at tiny bucket width") {
    // bucketCents=1 makes the prune as aggressive as it gets; the
    // result must be identical to the default
    val part = spark.read.parquet(s"$sf/part.parquet")
    val a = Mining.skyline2d(part, "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val b = Mining.skyline2d(part, "p_retailprice", "p_size",
      bucketCents = 1L)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  // ---- ewmaDaily -----------------------------------------------------

  test("ewmaDaily: exact integer recurrence and spike flags") {
    val df = Seq(
      ("t", Date.valueOf("2024-01-01"), 10L),
      ("t", Date.valueOf("2024-01-02"), 20L),
      ("t", Date.valueOf("2024-01-03"), 100L), // spike: 100e6 > 2·s1
      ("u", Date.valueOf("2024-01-01"), 5L)
    ).toDF("k", "day", "n")
    val out = Temporal.ewmaDaily(df, "k", "day", "n")
      .orderBy("key", "day").collect()
    // t: s0 = 10e6; s1 = (3·20e6 + 7·10e6) div 10 = 13e6;
    //    s2 = (3·100e6 + 7·13e6) div 10 = 39_100_000
    assert(out.map(r => (r.getString(0), r.getLong(3))).toSeq ==
      Seq(("t", 10000000L), ("t", 13000000L), ("t", 39100000L),
        ("u", 5000000L)))
    assert(out.map(_.getBoolean(4)).toSeq ==
      Seq(false, false, true, false))
  }

  test("ewmaDaily truncating division is exact (odd sums)") {
    val df = Seq(("t", Date.valueOf("2024-01-01"), 1L),
      ("t", Date.valueOf("2024-01-02"), 2L)).toDF("k", "day", "n")
    val out = Temporal.ewmaDaily(df, "k", "day", "n")
      .orderBy("day").collect()
    // s1 = (3·2e6 + 7·1e6) div 10 = 1_300_000
    assert(out(1).getLong(3) == 1300000L)
  }

  // ---- attribution ---------------------------------------------------

  test("attribution: first/last/linear credits with integer remainder to earliest") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      // user 1: three touches then a purchase → linear 333_333/333_333/
      // 333_334 with the remainder 1 on the EARLIEST touch
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", ts("2024-01-01 11:00:00")),
      (3L, 1L, "view", ts("2024-01-01 12:00:00")),
      (4L, 1L, "purchase", ts("2024-01-01 13:00:00")),
      // user 2: a touch OUTSIDE the lookback — no credit at all
      (5L, 2L, "view", ts("2023-12-01 10:00:00")),
      (6L, 2L, "purchase", ts("2024-01-01 10:00:00")),
      // user 3: single touch gets all three models' full credit
      (7L, 3L, "click", ts("2024-01-01 09:00:00")),
      (8L, 3L, "purchase", ts("2024-01-01 09:30:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Temporal.attribution(df, "user_id", "event_type", "ts",
      "event_id", "purchase", Seq("view", "click"), 7L * 86400L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // user1: first=view(10:00) +1_000_000 first/linear-remainder;
    // last=view(12:00); click middle
    // view: touches 2 (user1 t1,t3); first 1e6; last 1e6;
    //   linear 333_333+1 + 333_333 = 666_667
    assert(out("view") == (2L, 1000000L, 1000000L, 666667L))
    // click: user1 middle (333_333) + user3 full (1e6 all models)
    assert(out("click") == (2L, 1000000L, 1000000L, 1333333L))
  }

  test("attribution: per-conversion linear credit sums to exactly 1e6") {
    val events = graft.model.Tables.events(spark, sf)
    val out = Temporal.attribution(events, "user_id", "event_type", "ts",
      "event_id", "purchase", Seq("view", "click"), 7L * 86400L)
    val total = out.agg(sum("linear_ppm")).collect()(0).getLong(0)
    // total linear credit = 1e6 × (# purchases with ≥1 touch in window)
    val conv = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("event_id").as("cid"),
        col("ts").as("cts"))
    val touch = events.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("u"), col("ts").as("tts"))
    val nCredited = conv.join(touch, "u")
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - expr("INTERVAL 604800 SECONDS"))
      .select("cid").distinct().count()
    assert(total == 1000000L * nCredited)
  }
}
