package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

class GroupedTopKSpec extends SparkSpec {
  import spark.implicits._

  private def topkDf(k: Int) = {
    val w = Window.partitionBy($"l_suppkey").orderBy($"l_quantity".desc,
      $"l_orderkey".asc, $"l_linenumber".asc) // total order → deterministic
    Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
  }

  test("rewrite replaces WindowExec with the bounded-heap operator") {
    val df = topkDf(3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK "),
      s"expected the custom operator in:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains(" Sort "),
      s"window sort must be gone:\n$plan")
  }

  test("map-side partial prunes the shuffle to ≤ partitions × groups × k rows") {
    val k = 3
    val df = topkDf(k)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopKPartial"),
      s"expected the partial prune below the exchange:\n$plan")
    val base = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
    val inputRows = base.count()
    val groups = base.select("l_suppkey").distinct().count()
    val inputParts = base.rdd.getNumPartitions
    val shuffled = ShuffleAudit.measure(df).shuffleRecords
    // the prune bound holds only for partitions the ADAPTIVE SKIP did
    // not degrade to pass-through (kept/seen > SkipRatio or the 128k
    // buffer cap) — a skipped partition legitimately forwards its
    // whole tail, so the inequality is conditional on the metric, not
    // unconditional (r13 advice: asserting it blind makes the test
    // data-dependent and overstates the README invariant)
    val numSkipped = ShuffleAudit.flatten(df.queryExecution.executedPlan)
      .collect {
        case p: GroupedTopKPartialExec => p.metrics("numSkipped").value
      }.sum
    if (numSkipped == 0)
      assert(shuffled <= inputParts * groups * k,
        s"partial must bound the exchange: $shuffled rows shuffled vs " +
          s"$inputParts parts × $groups groups × $k")
    else
      // degraded partitions may forward everything; the exchange is
      // still bounded by the input (sanity) rather than the prune bound
      assert(shuffled <= inputRows,
        s"even degraded, the partial must not AMPLIFY: $shuffled of $inputRows")
    // on this fixture (≤ ~100 suppliers per 32 partitions, k=3) the
    // prune must actually engage — pin that the skip did NOT fire, so
    // the strong branch above is the one exercised
    assert(numSkipped == 0,
      s"adaptive skip fired on the lineitem fixture ($numSkipped parts) — " +
        "kept/seen should be far below SkipRatio here")
    assert(shuffled < inputRows / 2,
      s"the exchange must not carry the corpus: $shuffled of $inputRows")
  }

  test("adaptive skip engages on key-per-row data, stays correct, never amplifies") {
    // groups ≈ rows: every key distinct → the heaps keep everything,
    // pruning cannot pay, and the partial must degrade to pass-through
    // (numSkipped > 0) while computing the identical answer. This is
    // the zipf-tail/one-component-per-doc shape the skip exists for.
    // coalesce(2): partitions must be LARGER than SampleRows (8192)
    // for the ratio check to fire at all — 20k rows/partition here
    val n = 40000
    val df = spark.range(n.toLong).coalesce(2)
      .select($"id".as("g"), ($"id" * 7 % 13).as("v"))
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"g".asc)
    val out = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    // drive THIS QueryExecution (count() would build a fresh one and
    // the metrics would accrue on the invisible copy)
    out.queryExecution.toRdd.foreach(_ => ())
    val exec = out.queryExecution.executedPlan
    assert(exec.toString.contains("GroupedTopKPartial"))
    val nodes = ShuffleAudit.flatten(exec)
    val numSkipped = nodes.collect {
      case p: GroupedTopKPartialExec => p.metrics("numSkipped").value
    }.sum
    assert(numSkipped > 0,
      "key-per-row partitions past SampleRows must trip the skip")
    // the tax is bounded: pass-through forwards each row ONCE — the
    // partial's output (heap contents + forwarded tail) never exceeds
    // the input, so the exchange carries ≤ n rows
    val partialOut = nodes.collect {
      case p: GroupedTopKPartialExec => p.metrics("numOutputRows").value
    }.sum
    assert(partialOut <= n,
      s"pass-through must not amplify: $partialOut partial-output rows of $n")
    // and the degraded partial still yields the exact answer: every
    // key is its own group → exactly one rank-1 row per input row
    val finalOut = nodes.collect {
      case p: GroupedTopKExec => p.metrics("numOutputRows").value
    }.sum
    assert(finalOut == n, s"expected $n output rows, got $finalOut")
  }

  test("heap operator returns exactly the window form's rows and ranks") {
    // reference computed driver-side from raw data — no window, no rule
    val got = topkDf(2)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getInt(3)))
      .toSet
    // reference: per supplier, take the 2 best rows by the same total
    // order, computed driver-side from the raw data
    val raw = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (supp, rows) =>
      rows.sortBy(t => (-t._4, t._2, t._3)).take(2).zipWithIndex
        .map { case (t, i) => (supp, t._2, t._3, i + 1) }.toSeq
    }.toSet
    assert(got == expected)
  }

  test("rank-1 shape (argmax) and rn < k shape both rewrite") {
    val w = Window.partitionBy($"l_suppkey").orderBy($"l_quantity".desc,
      $"l_orderkey".asc, $"l_linenumber".asc)
    val base = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .withColumn("rn", row_number().over(w))
    for (f <- Seq(base.filter($"rn" === 1), base.filter($"rn" < 4))) {
      f.collect()
      assert(f.queryExecution.executedPlan.toString
        .contains("GroupedTopK "))
    }
    // rn === 1 keeps exactly one row per supplier
    val n = base.filter($"rn" === 1).count()
    val nSupp = Tables.lineitem(spark, sf)
      .select("l_suppkey").distinct().count()
    assert(n == nSupp)
  }

  test("null group keys and null sort keys match the window semantics") {
    // nulls group together; sort nulls follow SortOrder null ordering —
    // read expectations off a driver-side replay of the same rules
    val df = Seq(
      (Some("a"), Some(3.0), 1L), (Some("a"), None, 2L),
      (Some("a"), Some(1.0), 3L), (None, Some(9.0), 4L),
      (None, Some(2.0), 5L), (None, None, 6L),
    ).toDF("g", "v", "id")
    val w = Window.partitionBy($"g").orderBy($"v".desc_nulls_last, $"id")
    val out = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    out.collect()
    assert(out.queryExecution.executedPlan.toString.contains("GroupedTopK "))
    val got = out.select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // group "a": v desc nulls last → 3.0(id1), 1.0(id3); null-v id2 cut
    // group null: 9.0(id4), 2.0(id5); null-v id6 cut
    assert(got == Map(1L -> 1, 3L -> 2, 4L -> 1, 5L -> 2), got.toString)
  }

  test("float/double partition keys bail out to the stock window plan") {
    // the rule runs before NormalizeFloatingNumbers (which only
    // rewrites Window/Aggregate/Join), so un-normalized -0.0 vs 0.0
    // keys would hash apart in the heap exec and split one group —
    // the rewrite must decline and leave the Window for the stock
    // normalization to handle (r2 advice, medium)
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L)).toDF("g", "id")
    val w = Window.partitionBy($"g").orderBy($"id")
    val out = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 1)
    val rows = out.collect()
    assert(!out.queryExecution.executedPlan.toString.contains("GroupedTopK "),
      "double partition key must not rewrite")
    // -0.0 and 0.0 are ONE normalized group → one rank-1 row for it
    assert(rows.length == 2, rows.mkString(","))

    // nested float (struct field) must also bail
    val nested = df.select(struct($"g").as("s"), $"id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"s").orderBy($"id")))
      .filter($"rn" <= 1)
    nested.collect()
    assert(!nested.queryExecution.executedPlan.toString
      .contains("GroupedTopK "), "nested double key must not rewrite")

    // integer keys still rewrite (guard must not over-fire)
    val ints = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("g", "id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"id")))
      .filter($"rn" <= 1)
    ints.collect()
    assert(ints.queryExecution.executedPlan.toString
      .contains("GroupedTopK "))
  }

  test("rewrite bails above spark.graft.groupTopK.maxK (WindowExec can spill)") {
    val w = Window.partitionBy($"l_suppkey").orderBy($"l_quantity".desc)
    val base = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_quantity")
      .withColumn("rn", row_number().over(w))
    spark.conf.set("spark.graft.groupTopK.maxK", "5")
    try {
      val big = base.filter($"rn" <= 100)
      big.collect()
      assert(!big.queryExecution.executedPlan.toString
        .contains("GroupedTopK "), "k=100 > maxK=5 must keep WindowExec")
      val small = base.filter($"rn" <= 5)
      small.collect()
      assert(small.queryExecution.executedPlan.toString
        .contains("GroupedTopK "))
    } finally spark.conf.unset("spark.graft.groupTopK.maxK")
  }
}
