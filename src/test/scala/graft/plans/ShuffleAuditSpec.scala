package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Runtime shuffle-volume ceilings for representative operators —
  * the measured complement to PlanAuditSpec's shape assertions.
  * Each bound here encodes the scale contract the operator's
  * Scaladoc claims: map-side combine keeps agg shuffles key-sized,
  * dedup shuffles digests instead of document text, broadcast joins
  * shuffle nothing. A regression that breaks the contract moves
  * orders of magnitude, so the ceilings are loose enough to never
  * flake and tight enough to catch the failure mode.
  */
class ShuffleAuditSpec extends SparkSpec {

  test("row-local projection/filter shuffles nothing") {
    val s = ShuffleAudit.measure(
      Tables.lineitem(spark, sf)
        .filter(col("l_quantity") > 10)
        .select("l_orderkey", "l_quantity"))
    assert(s.exchanges == 0 && s.shuffleBytes == 0L, s"$s")
  }

  test("groupBy agg shuffle is key-sized, not row-sized (partial agg)") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.count()
    val s = ShuffleAudit.measure(
      li.groupBy("l_returnflag").agg(sum("l_quantity")))
    assert(s.exchanges >= 1, s"$s")
    assert(s.shuffleRecords > 0, s"metrics must be populated: $s")
    // 3 distinct flags × ≤32 map partitions, far below the row count
    assert(s.shuffleRecords <= 3 * 32,
      s"map-side combine must shrink the shuffle to keys: $s")
    assert(s.shuffleRecords < rows / 10, s"rows=$rows, $s")
  }

  test("dimension join broadcasts: zero shuffle exchanges") {
    val s = ShuffleAudit.measure(
      Tables.supplier(spark, sf)
        .join(Tables.nation(spark, sf),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_name", "n_name"))
    assert(s.broadcasts >= 1, s"$s")
    assert(s.exchanges == 0, s"dimension join must not shuffle: $s")
  }

  test("exact dedup shuffles digests, never document text") {
    val docs = Tables.documents(spark, sf)
    val textBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
    val s = ShuffleAudit.measure(
      graft.operators.Dedup.exactGroups(docs, "doc_id", "text"))
    assert(s.exchanges >= 1 && s.shuffleBytes > 0, s"$s")
    assert(s.shuffleBytes < textBytes,
      s"dedup must shuffle digests (~48B/doc), not text: " +
        s"shuffled ${s.shuffleBytes} of $textBytes text bytes: $s")
  }

  test("substringDedup shuffles gram rows + interval rows, never k× positions") {
    val docs = Tables.documents(spark, sf)
    val k = 8
    // upper bound on legitimate shuffle records: every gram row visits
    // the shingle groupBy + the firsts join (≲ 2×grams + firsts), and
    // every CUT gram is ONE interval row to its doc group — the
    // pre-interval formulation also exploded k positions per cut gram
    // and re-shuffled every doc token for the rebuild
    val nGrams = docs.select(graft.functions.Portable.tokens(col("text"))
      .as("t")).select(greatest(size(col("t")) - (k - 1), lit(0)).as("g"))
      .agg(sum("g")).head.getLong(0)
    val s = ShuffleAudit.measure(
      graft.operators.Dedup.substringDedup(docs, "doc_id", "text", k))
    assert(s.shuffleRecords > 0, s"$s")
    assert(s.shuffleRecords <= 3 * nGrams + nGrams / 2,
      s"interval cut lists must keep shuffle ≤ ~3×grams " +
        s"(${s.shuffleRecords} vs $nGrams grams): $s")
  }

  test("bloomPrunedJoin moves ~selectivity of the plain join's shuffle") {
    import spark.implicits._
    // 50k-row big side, 0.5% of keys match; broadcast disabled so the
    // join must shuffle — the regime the runtime filter exists for
    val big = (1L to 50000L).map(i => (i % 10000, s"p$i")).toDF("bk", "pay")
    val small = (1L to 50L).map(i => (i, s"d$i")).toDF("sk", "dim")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = ShuffleAudit.measure(
        big.join(small, col("bk") === col("sk")))
      val pruned = ShuffleAudit.measure(
        graft.operators.Scale.bloomPrunedJoin(big, small, "bk", "sk"))
      assert(plain.shuffleRecords >= 50000L,
        s"plain join must shuffle the whole big side: $plain")
      assert(pruned.shuffleRecords < plain.shuffleRecords / 10,
        s"bloom filter must prune the big side BEFORE its shuffle: " +
          s"pruned=${pruned.shuffleRecords} plain=${plain.shuffleRecords}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("retention shuffles (user, week) pairs, never raw events") {
    val ev = Tables.events(spark, sf)
    val rows = ev.count()
    val users = ev.select("user_id").distinct().count()
    val s = ShuffleAudit.measure(
      graft.operators.Temporal.retentionCohorts(ev, "user_id", "ts"))
    assert(s.exchanges >= 1 && s.shuffleRecords > 0, s"$s")
    // every shuffle is user- or (user, week)-keyed with map-side
    // combine: bounded by users × weeks (≤5 weeks in the fixture) ×
    // the handful of stages — far below the event count
    assert(s.shuffleRecords < rows,
      s"retention must never shuffle raw events: rows=$rows $s")
    assert(s.shuffleRecords <= users * 5 * 6,
      s"shuffles must stay (user, week)-bounded: users=$users $s")
  }

  test("quantileNormalize shuffles the cutoff frame, not the facts") {
    val ev = Tables.events(spark, sf)
    val rows = ev.count()
    val s = ShuffleAudit.measure(
      graft.operators.Features.quantileNormalize(
        ev.select("event_id", "event_type", "value"), "value",
        "event_type", gridSize = 20))
    // one percentile aggregate (groups-sized) + the AQE-broadcast
    // stats join: the facts themselves never enter an exchange
    assert(s.shuffleRecords < rows / 10,
      s"facts must not shuffle for the grid join: rows=$rows $s")
  }

  test("pqEncode never shuffles the corpus vectors") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val rows = e.count()
    val cb = graft.operators.Similarity.pqSeedCodebook(
      e, "vec_id", "embedding", 8, 8, 16).localCheckpoint()
    val s = ShuffleAudit.measure(
      graft.operators.Similarity.pqEncode(e, "vec_id", "embedding", cb, 8, 8))
    // the only exchanges pack the 8×16-cell codebook into its 1-row
    // broadcast form; the vectors meet it in a broadcast cross join
    // and the argmin is row-local
    assert(s.shuffleRecords <= 4L * 8 * 16 + 16,
      s"only codebook cells may shuffle: rows=$rows $s")
    assert(s.broadcasts >= 1, s"codebook must broadcast: $s")
  }

  test("ksDrift shuffles distinct value points, never raw facts") {
    val ev = Tables.events(spark, sf)
      .withColumn("half",
        when(dayofmonth(col("ts")) <= 15, "h1").otherwise("h2"))
    val points = ev.select("event_type", "value").distinct().count()
    val s = ShuffleAudit.measure(
      graft.operators.Features.ksDrift(ev, "event_type", "half",
        "h1", "h2", "value"))
    // facts collapse to (group, value) cells in a partial agg BEFORE
    // any exchange; the window + final agg re-shuffle those cells only
    assert(s.shuffleRecords <= 4L * points,
      s"shuffles must stay point-bounded: points=$points $s")
  }

  test("cusumChangepoints shuffles the daily frame, never raw events") {
    val ev = Tables.events(spark, sf)
    val rows = ev.count()
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val days = daily.count()
    val s = ShuffleAudit.measure(
      graft.operators.Temporal.cusumChangepoints(daily, "event_type",
        "day", "n"))
    // calendar-bounded: a couple of day-cell-sized exchanges (the
    // daily agg + the per-key gather), never the event rows
    assert(s.shuffleRecords <= 4L * days,
      s"state must stay calendar-bounded: days=$days rows=$rows $s")
  }

  test("amsSketch shuffle is sketch-sized, never the key stream") {
    // 40k rows, 2 groups × 500 distinct keys: the partial agg must
    // collapse each map partition to ≤ its (group, bucket) cells
    // pin the map-partition count (4th range arg) — under a larger
    // default parallelism (local[32] benches) spark.range would split
    // into more partitions and a literal partition bound is env-flaky
    val df = spark.range(0, 40000, 1, 8).select(
      (col("id") % 2).cast("string").as("g"),
      concat(lit("k"), col("id") % 500).as("k"))
    val s = ShuffleAudit.measure(
      graft.operators.Sketches.amsSketch(df, "g", "k"))
    assert(s.shuffleRecords > 0, s"$s")
    // ≤ groups × buckets × map partitions (loose), ≪ the 40k rows
    val mapParts = df.rdd.getNumPartitions.toLong
    val ceiling = 2L * graft.operators.Sketches.AmsBuckets * mapParts
    assert(s.shuffleRecords <= ceiling,
      s"sketch shuffle must be (group × bucket)-cell-sized: $s")
    assert(s.shuffleRecords < 40000 / 4, s"$s")
  }

  test("cappedShingleFreqs shuffles 8-byte digests, never shingle text") {
    val docs = Tables.documents(spark, sf)
    val shingleBytes = graft.operators.Dedup
      .docShingles(docs, "doc_id", "text", 3, dedup = false)
      .agg(sum(length(col("shingle")))).head.getLong(0)
    val s = ShuffleAudit.measure(
      graft.operators.Dedup.cappedShingleFreqs(docs, "doc_id", "text"))
    assert(s.exchanges >= 1 && s.shuffleBytes > 0, s"$s")
    assert(s.shuffleBytes < shingleBytes,
      s"tf groupBy must key on the digest, not the shingle string: " +
        s"shuffled ${s.shuffleBytes} of $shingleBytes shingle bytes: $s")
  }

  test("stats() before any action reports zero volumes") {
    val df = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val s = ShuffleAudit.stats(df)
    assert(s.shuffleRecords == 0L && s.shuffleBytes == 0L, s"$s")
  }
}
