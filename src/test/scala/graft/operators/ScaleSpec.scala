package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans without a shuffle exchange") {
    // default warehouse dir (spark.sql.warehouse.dir is static config);
    // DROP TABLE below cleans the files
    val left = (1L to 1000L).map(i => (i % 50, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i % 50, s"r$i")).toDF("k", "rv")
    Scale.writeBucketed(left, "bkt_left", Seq("k"), 8)
    Scale.writeBucketed(right, "bkt_right", Seq("k"), 8)
    // disable broadcast so the join must be sort-merge (the co-located case)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "bkt_left", "bkt_right", Seq("k"))
      assert(joined.count() == 1000L * 10) // 50 keys, 20 left × 10 right each
      val planStr = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(!planStr.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$planStr")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("AQE splits the skewed partition at runtime (skew=true in the final plan)") {
    // one hot key dominating the left side; thresholds lowered so the
    // test-sized data crosses AQE's skew detection bar
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // md5-derived payload: shuffle blocks are compressed, so the pad
      // must be incompressible or the hot partition stays under the
      // detection threshold
      val left = spark.range(120000L)
        .selectExpr("CASE WHEN id % 2 = 0 THEN 0L ELSE id END AS k",
          "concat(md5(cast(id AS string)), md5(cast(id + 7 AS string))) AS lv")
      val right = spark.range(40000L)
        .selectExpr("id AS k", "concat('r', id) AS rv")
      val joined = left.join(right, "k")
      // collect(), not count(): count() wraps a NEW query execution —
      // the plan inspected below must be the one that actually ran
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot-key join side as skewed:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("salted join matches the plain join result") {
    val left = (1L to 2000L).map(i => (if (i % 10 == 0) 1L else i % 7, i))
      .toDF("k", "lv") // key 1 is hot
    val right = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(left, right, Seq("k"), saltFactor = 4)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salted left join preserves unmatched rows") {
    val left = Seq((1L, "a"), (99L, "unmatched")).toDF("k", "lv")
    val right = Seq((1L, "dim")).toDF("k", "rv")
    val out = Scale.saltedJoin(left, right, Seq("k"), 3, "left")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    assert(out == Set((1L, Some("dim")), (99L, None)))
  }

  test("salted left_anti keeps only keys absent from the right") {
    val left = Seq((1L, "hit"), (99L, "miss"), (99L, "miss2")).toDF("k", "lv")
    val right = Seq((1L, "dim")).toDF("k", "rv")
    val out = Scale.saltedJoin(left, right, Seq("k"), 3, "left_anti")
      .select("k", "lv").collect().map(_.toSeq).toSet
    assert(out == Set(Seq(99L, "miss"), Seq(99L, "miss2")))
  }

  test("skewReport: shares, salt suggestion, deterministic tie-break") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k")
    val rows = Scale.skewReport(df, "k", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("a", 6L, 0.6, 2L), // 6 / mean(10/3) = 1.8 → salt 2
      ("b", 3L, 0.3, 1L),
      ("c", 1L, 0.1, 1L)))
  }

  test("denseIds: global order ids with no single-partition window") {
    import org.apache.spark.sql.functions.col
    val df = Seq((30L, "b"), (10L, "a"), (20L, "a"), (40L, "c"))
      .toDF("k", "grp")
    val out = Scale.denseIds(df, Seq(col("grp"), col("k")), "rid")
    val got = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2))).sortBy(_._3)
    assert(got.toSeq == Seq((10L, "a", 1L), (20L, "a", 2L),
      (30L, "b", 3L), (40L, "c", 4L)))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "denseIds must not plan a window at all")
  }

  test("salted right/full outer is rejected — replication would dup rows") {
    val left = Seq((1L, "a")).toDF("k", "lv")
    val right = Seq((1L, "dim"), (2L, "orphan")).toDF("k", "rv")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Scale.saltedJoin(left, right, Seq("k"), 3, jt)
      }
      assert(e.getMessage.contains("corrupts"), s"$jt must be rejected")
    }
  }

  test("bloomPrunedJoin == plain join, and the filter actually prunes") {
    val big = (0L until 20000L).map(i => (i, s"row$i")).toDF("bk", "payload")
    // small side: 1% of the key space, plus keys with no big-side match
    val small = ((0L until 20000L by 100) ++ Seq(90001L, 90002L))
      .map(k => (k, s"dim$k")).toDF("sk", "dim")
    val pruned = Scale.bloomPrunedJoin(big, small, "bk", "sk")
      .select("bk", "payload", "dim").orderBy("bk").collect().toSeq
    val plain = big.join(small, big("bk") === small("sk"))
      .select("bk", "payload", "dim").orderBy("bk").collect().toSeq
    assert(pruned == plain)
    assert(pruned.length == 200)
    // the gate itself must reject the overwhelming majority of the big
    // side pre-join (bloom fp rate ~1% at 10 bits/key)
    val (words, m, k) = graft.functions.Bloom.buildSized(
      small.select("sk"), "sk")
    val passed = big.filter(
      graft.functions.Bloom.mightContain(big("bk"), words, m, k)).count()
    assert(passed < 1000, s"bloom passed $passed of 20000 — not pruning")
  }

  test("bloomPrunedJoin left_semi keeps big-side schema; outer types rejected") {
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("bk", "payload")
    val small = Seq((2L, "x"), (9L, "y")).toDF("sk", "dim")
    val semi = Scale.bloomPrunedJoin(big, small, "bk", "sk", "left_semi")
    assert(semi.columns.toSeq == Seq("bk", "payload"))
    assert(semi.collect().map(_.getLong(0)).toSeq == Seq(2L))
    for (jt <- Seq("left", "left_outer", "full", "right")) {
      val e = intercept[IllegalArgumentException] {
        Scale.bloomPrunedJoin(big, small, "bk", "sk", jt)
      }
      assert(e.getMessage.contains("drop big-side rows"), s"$jt")
    }
  }

  // deterministic skewed fixture: key k appears k times (keys 1..20),
  // plus nulls that the planner must exclude
  private def shardFixture = {
    val rows = (1 to 20).flatMap(k => Seq.fill(k)((k.toLong, 10L))) ++
      Seq((-1L, 0L)) // sentinel replaced by null below
    val df = rows.toDF("key", "w")
    df.withColumn("key",
      org.apache.spark.sql.functions.when($"key" === -1L, null)
        .otherwise($"key"))
  }

  test("shardPlan: contiguous key ranges, full coverage, balanced") {
    val numShards = 4
    val plan = Scale.shardPlan(shardFixture, "key", "w", numShards)
      .collect()
    val shards = plan.map(_.getInt(0)).toSeq
    assert(shards == shards.sorted && shards.toSet.subsetOf(
      (0 until numShards).toSet), s"shard ids: $shards")
    // contiguity: each shard's min_key follows the previous max_key
    val ranges = plan.map(r => (r.getLong(3), r.getLong(4))) // min,max
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(lo2 > hi, s"overlap: $ranges")
      case _ =>
    }
    // coverage: all 210 non-null rows land somewhere; weights add up
    assert(plan.map(_.getLong(1)).sum == 210L)
    assert(plan.map(_.getLong(5)).sum == 2100L)
    // balance: no shard exceeds total/numShards + heaviest key (20)
    assert(plan.map(_.getLong(1)).max <= 210 / numShards + 20)
  }

  test("keyShardMap is monotone in key and never splits a key") {
    val m = Scale.keyShardMap(shardFixture, "key", 4)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(m.map(_._1).toSeq == (1L to 20L), "one row per non-null key")
    assert(m.sliding(2).forall {
      case Array((_, s1), (_, s2)) => s2 >= s1
      case _ => true
    }, s"shard must be monotone in key: ${m.toSeq}")
  }

  test("assignShards stamps every row with its key's shard, null-safe") {
    val m = Scale.keyShardMap(shardFixture, "key", 4)
    val assigned = Scale.assignShards(shardFixture, "key", m)
    assert(assigned.count() == 211, "left join keeps the null-key row")
    // every non-null row's shard matches the map; the null row gets null
    val bad = assigned.join(m.withColumnRenamed("shard", "expected"), "key")
      .filter($"shard" =!= $"expected").count()
    assert(bad == 0)
    assert(assigned.filter($"key".isNull).head.isNullAt(
      assigned.columns.indexOf("shard")))
  }

  test("bloomPrunedJoin works when both keys share a name") {
    val big = (1L to 100L).map(i => (i % 20, s"p$i")).toDF("k", "pay")
    val small = Seq((3L, "d3"), (7L, "d7")).toDF("k", "dim")
    // same-name keys previously failed analysis with an ambiguous
    // reference; disambiguation must come from the frames themselves
    val joined = Scale.bloomPrunedJoin(big, small, "k", "k")
    assert(joined.count() == 10, s"got ${joined.count()}")
  }

  test("writeBucketed rejects qualified or mixed-case table names") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Scale.writeBucketed(df, "MyTable", Seq("k"), 4)
    }
    intercept[IllegalArgumentException] {
      Scale.writeBucketed(df, "db.tbl", Seq("k"), 4)
    }
  }
}
