package graft.operators

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("zscore exact values; constant group → null, not an error") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("c", 5.0), ("c", 5.0))
      .toDF("g", "value")
    val z = Features.zscoreByGroup(df, "value", "g")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(z(("a", 1.0)).contains(-1.0)) // mean 2, sd_samp 1
    assert(z(("a", 2.0)).contains(0.0))
    assert(z(("a", 3.0)).contains(1.0))
    assert(z(("c", 5.0)).isEmpty, "zero variance must yield null")
  }

  test("null group keys form their own group and are kept") {
    // a plain equi-join on the group column would silently drop the
    // null-group rows; the null-safe join must keep them AND compute
    // their stats as a real group (r2 advice)
    val df = Seq((Option("a"), 1.0), (Option("a"), 3.0),
      (Option.empty[String], 2.0), (Option.empty[String], 4.0))
      .toDF("g", "value")
    val z = Features.zscoreByGroup(df, "value", "g")
    assert(z.count() == 4, "null-group rows must survive")
    val nullZ = z.filter($"g".isNull).select("value", "zscore")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // null group: mean 3, stddev_samp sqrt(2) → z = ∓0.707107
    assert(nullZ(2.0) == -0.707107 && nullZ(4.0) == 0.707107)
    val w = Features.winsorizeByGroup(df, "value", "g", lo = 0.25, hi = 0.75)
    assert(w.count() == 4)
    assert(w.filter($"g".isNull).count() == 2)
  }

  test("stats join: AQE broadcasts small stats, degrades without it, same rows") {
    // the group-stats join carries NO broadcast() hint (an OOM risk at
    // millions of groups); this pins both halves of the contract:
    // (a) at default thresholds AQE still picks a broadcast join from
    //     the stats frame's true runtime size,
    // (b) with broadcast disabled the plan degrades to a non-broadcast
    //     join and the RESULT is identical
    val df = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id % 7 AS g", "value")
    def run(): (Set[Seq[Any]], String) = {
      val z = Features.zscoreByGroup(df, "value", "g")
      val rows = z.collect().map(_.toSeq).toSet
      (rows, z.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head)
    }
    val (rowsB, planB) = run()
    assert(planB.contains("BroadcastHashJoin"),
      s"AQE should broadcast the tiny stats frame:\n$planB")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val (rowsN, planN) = run()
      assert(!planN.contains("BroadcastHashJoin"),
        s"with broadcast disabled the join must degrade, not hint it back:\n$planN")
      assert(rowsN == rowsB, "join strategy must not change the result")
      val w = Features.winsorizeByGroup(df, "value", "g")
      assert(w.count() == df.count(), "winsorize keeps every row without broadcast")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("winsorize clips into the interpolated percentile band") {
    val df = Seq.tabulate(4)(i => ("g", Seq(0.0, 10.0, 20.0, 100.0)(i)))
      .toDF("g", "value")
    val w = Features.winsorizeByGroup(df, "value", "g", lo = 0.25, hi = 0.75)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // sorted [0,10,20,100]: p25 = 7.5, p75 = 40 (linear interpolation)
    assert(w(0.0) == 7.5)
    assert(w(10.0) == 10.0)
    assert(w(20.0) == 20.0)
    assert(w(100.0) == 40.0)
  }

  test("quantileNormalize: per-group grid, cross-group comparability") {
    // group a: 1..4 — group b: 101..104. Same SHAPE, shifted scale:
    // normalization must give both groups identical pct profiles.
    val df = (1 to 4).map(i => ("a", i.toDouble)) ++
      (1 to 4).map(i => ("b", 100.0 + i))
    val d = df.toDF("grp", "v")
    val got = Features.quantileNormalize(d, "v", "grp", gridSize = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    val byGroup = got.groupBy(_._1).map { case (g, rows) =>
      g -> rows.sortBy(_._2).map(_._3).toSeq
    }
    assert(byGroup("a") == byGroup("b"),
      s"shifted groups must normalize identically: $byGroup")
    // quartile cutoffs of [1,2,3,4]: p25=1.75 p50=2.5 p75=3.25 →
    // 1→0 cutoffs ≤ → 0; 2→25; 3→50; 4→75
    assert(byGroup("a") == Seq(0, 25, 50, 75), s"got ${byGroup("a")}")
  }

  test("madOutliers: median-anchored cutoff ignores the outlier's own drag") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0),
      ("g", 100.0)).toDF("grp", "value")
    // median 3, |dev| = [2,1,0,1,97], MAD = 1 → cutoff 3: only 100
    // survives (a zscore gate would have σ≈43 dragged by the outlier)
    val got = Features.madOutliers(df, "value", "grp", k = 3.0)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((100.0, 97.0, 3.0)), s"got ${got.toSeq}")
  }

  test("abTest: hash arms partition the units; a true effect is detected") {
    import graft.operators.Curation
    val units = (1L to 400L).toDF("u")
    // recover each unit's arm through the SAME portable hash the
    // operator uses, then plant a real effect: arm0 ≡ 8.0, arm1 ≡ 2.0
    val arms = units.withColumn("arm", Curation.hashBucket($"u") % 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = (1L to 400L).map(u =>
      (u, if (arms(u) == 0L) 8.0 else 2.0)).toDF("u", "value")
    // per-arm constant values → zero variance → t is NaN; add tiny
    // deterministic jitter so variances are positive
    val jittered = (1L to 400L).map(u =>
      (u, (if (arms(u) == 0L) 8.0 else 2.0) + (u % 7) * 0.01))
      .toDF("u", "value")
    val r = Features.abTest(jittered, "u", "value").collect()(0)
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na + nb == 400L && na > 100 && nb > 100, s"arm sizes $na/$nb")
    assert(r.getDouble(2) > r.getDouble(3) + 5.0, "means must separate")
    assert(r.getDouble(4) > 100.0, s"t must be huge, got ${r.getDouble(4)}")
    assert(r.getBoolean(5), "effect must be significant")
    assert(df.count() == 400) // fixture sanity
  }

  test("pairwiseCorrelation: zeros from the dense matrix, exact r, null on zero variance") {
    // counts: u1 a=2 b=1 z=1 | u2 a=1 b=0 z=1 | u3 a=0 b=2 z=1
    val ev = Seq(
      ("u1", "a"), ("u1", "a"), ("u1", "b"), ("u1", "z"),
      ("u2", "a"), ("u2", "z"),
      ("u3", "b"), ("u3", "b"), ("u3", "z"),
    ).toDF("user", "etype")
    val got = Features.pairwiseCorrelation(ev, "user", "etype")
      .orderBy("type_a", "type_b").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    // (a,b): n=3 Sx=3 Sy=3 Sxy=2 Sxx=5 Syy=5 → (6-9)/(√6·√6) = -0.5;
    // z is constant (1,1,1) → zero variance → null r
    assert(got.toSeq == Seq(
      (("a", "b"), 3L, Some(-0.5)),
      (("a", "z"), 3L, None),
      (("b", "z"), 3L, None)), s"got ${got.toSeq}")
  }

  test("categoricalDrift: hand-computed chi-square cells") {
    // A: 30x 10y, B: 10x 30y → every e = 20, every term (±10)²/20 = 5
    val df = (Seq.fill(30)(("A", "x")) ++ Seq.fill(10)(("A", "y")) ++
      Seq.fill(10)(("B", "x")) ++ Seq.fill(30)(("B", "y")))
      .toDF("slice", "cat")
    val got = Features.categoricalDrift(df, "slice", "cat")
      .orderBy("slice", "category").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("A", "x", 30L, 20.0, 5.0), ("A", "y", 10L, 20.0, 5.0),
      ("B", "x", 10L, 20.0, 5.0), ("B", "y", 30L, 20.0, 5.0)),
      got.mkString(", "))
  }

  test("categoricalDrift: a NULL category is a category, not a dropped cell") {
    // slice A: 5 null-lang docs; slice B: 5 "en" — the null cell's
    // observed count must survive the dense re-attach (a plain
    // equi-join zeroes it while the marginals still count it)
    val df = (Seq.fill(5)(("A", Option.empty[String])) ++
      Seq.fill(5)(("B", Option("en")))).toDF("slice", "cat")
    val got = Features.categoricalDrift(df, "slice", "cat")
      .collect().map(r => ((r.getString(0), Option(r.getString(1))),
        r.getLong(2))).toMap
    assert(got(("A", None)) == 5L, got.toString)
    assert(got(("B", None)) == 0L && got(("A", Some("en"))) == 0L)
    assert(got.values.sum == 10L, "observed counts must total the corpus")
  }

  test("ksDrift: hand-computed D, identical slices zero, missing slice null") {
    // a={1,2,3}, b={2,3,4}: D attained at v∈{1,2,3} = 3/9 → 333333 ppm
    val df = (Seq(1, 2, 3).map(v => ("g", "a", v.toDouble)) ++
      Seq(2, 3, 4).map(v => ("g", "b", v.toDouble)) ++
      Seq(5, 6).map(v => ("same", "a", v.toDouble)) ++
      Seq(5, 6).map(v => ("same", "b", v.toDouble)) ++
      Seq(7).map(v => ("lone", "a", v.toDouble)))
      .toDF("grp", "slice", "value")
    val got = Features.ksDrift(df, "grp", "slice", "a", "b", "value")
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      ("g", 3L, 3L, Some(333333L)),
      ("lone", 1L, 0L, None),
      ("same", 2L, 2L, Some(0L))), got.mkString(", "))
  }

  test("ksDrift ≡ driver-side two-sample KS on random samples") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(10).toDouble)
      val b = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(10).toDouble)
      val df = (a.map(("g", "a", _)) ++ b.map(("g", "b", _)))
        .toDF("grp", "slice", "value")
      val got = Features.ksDrift(df, "grp", "slice", "a", "b", "value")
        .collect().head.getLong(3)
      val vs = (a ++ b).distinct.sorted
      val d = vs.map(v => math.abs(
        a.count(_ <= v).toLong * b.length -
          b.count(_ <= v).toLong * a.length)).max
      assert(got == 1000000L * d / (a.length.toLong * b.length),
        s"a=$a b=$b")
    }
  }

  test("categoricalDrift: structural zeros contribute (n=0, e>0)") {
    val df = (Seq.fill(10)(("A", "x")) ++ Seq.fill(5)(("B", "x")) ++
      Seq.fill(5)(("B", "y"))).toDF("slice", "cat")
    val got = Features.categoricalDrift(df, "slice", "cat")
      .filter($"slice" === "A" && $"category" === "y").collect()
    assert(got.length == 1, "the absent (A,y) cell must be present")
    assert(got(0).getLong(2) == 0L)
    assert(got(0).getDouble(3) == 2.5)  // e = 5·10/20
    assert(got(0).getDouble(4) == 2.5)  // (0-2.5)²/2.5
  }
}
