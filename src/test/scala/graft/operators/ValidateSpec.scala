package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Option(10L), "b"),
    (2L, None: Option[Long], "a"),
    (3L, Option(9L), "a"),
    (3L, Option(9L), "a")
  ).toDF("k", "v", "s")

  test("profile: null/distinct counts and NATIVE-type min/max") {
    val p = Validate.profile(df, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(p("k") == ((0L, 3L, "1", "3")))
    // min on the NUMERIC value: 9 < 10 (a string-cast-first profile
    // would say "10" < "9"); distinct excludes the NULL
    assert(p("v") == ((1L, 2L, "9", "10")))
    assert(p("s") == ((0L, 2L, "a", "b")))
  }

  test("check: per-constraint violation counts in one aggregation") {
    val out = Validate.check(df, Seq(
      Validate.NotNull("v"),
      Validate.Unique(Seq("k")),
      Validate.Unique(Seq("k", "v", "s")),
      Validate.InRange("v", 0, 9.5),
      Validate.OneOf("s", Seq("a"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out("not_null(v)") == ((1L, false)))
    assert(out("unique(k)") == ((1L, false))) // one extra copy of k=3
    // the NULL-v row still participates in the struct key
    assert(out("unique(k,v,s)") == ((1L, false)))
    assert(out("in_range(v,0.0,9.5)") == ((1L, false))) // v=10; NULL exempt
    assert(out("one_of(s)") == ((1L, false)))
    // a clean frame passes everything
    val clean = Validate.check(df.filter($"k" === 1L),
      Seq(Validate.NotNull("v"), Validate.Unique(Seq("k"))))
    assert(clean.filter(!$"passed").isEmpty)
  }

  test("schemaDiff: statuses + widening vs breaking verdicts") {
    val dir = java.nio.file.Files.createTempDirectory("sdiff_").toString
    Seq((1, 1.0f, "a", 2L)).toDF("widens", "alsoWidens", "gone", "narrows")
      .write.mode("overwrite").parquet(s"$dir/v1")
    Seq((1L, 1.0, 2, "x")).toDF("widens", "alsoWidens", "narrows", "fresh")
      .write.mode("overwrite").parquet(s"$dir/v2")
    val got = Validate.schemaDiff(spark, s"$dir/v1", s"$dir/v2")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(4))))
      .toMap
    assert(got("widens") == (("retyped", "widened")), s"int->bigint: $got")
    assert(got("alsoWidens") == (("retyped", "widened")), "float->double")
    assert(got("narrows") == (("retyped", "break")), "bigint->int narrows")
    assert(got("gone") == (("removed", "break")))
    assert(got("fresh") == (("added", "ok")))
  }

  test("profileSketch: exact nulls/min/max, estimate within 3 sigma") {
    val data = (1 to 5000).map(i =>
      (i.toLong, s"s${i % 50}", if (i % 10 == 0) None else Some(s"v$i")))
      .toDF("id", "cat", "maybe")
    val p = Validate.profileSketch(data, Seq("id", "cat", "maybe"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getString(3), r.getString(4)))
      .toMap
    assert(p("id")._1 == 0L && p("maybe")._1 == 500L, "null counts exact")
    assert(p("id")._3 == "1" && p("id")._4 == "5000",
      "min/max on the native type, stringified after")
    // 3 sigma at m=64 registers is 39 % (large-n regime)
    assert(math.abs(p("id")._2 - 5000) < 0.39 * 5000, p("id").toString)
    assert(math.abs(p("maybe")._2 - 4500) < 0.39 * 4500, p("maybe").toString)
    assert(p("cat")._2 > 0, "small-cardinality estimate is positive")
    // the xxhash64 production path: same estimator over different
    // registers — same exactness for nulls/min/max, same error band
    val px = Validate.profileSketch(data, Seq("id", "maybe"),
      portable = false)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(px("maybe")._1 == 500L)
    assert(math.abs(px("id")._2 - 5000) < 0.39 * 5000, px("id").toString)
  }

  test("profileSketch plans ONE scan where profile plans one per column") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = graft.model.Tables.lineitem(spark, sf)
    def scans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s
      }.size
    val cols = Seq("l_orderkey", "l_returnflag", "l_linestatus")
    assert(scans(Validate.profileSketch(li, cols)) == 1,
      "C columns must profile in a single pass")
    assert(scans(Validate.profile(li, cols)) == cols.size,
      "the exact profile is the per-column-branch baseline")
  }

  test("benford: integer digit extraction, permille table, deviation") {
    val vals = Seq(
      ("g", 1.23),   // cents 122  -> digit 1 (1.23 is 1.2299..., floor)
      ("g", 19.99),  // cents 1998 -> digit 1
      ("g", 2.50),   // cents 250  -> digit 2
      ("g", 0.005),  // cents 0    -> filtered (not a positive amount)
      ("g", -5.0),   // negative   -> filtered
      ("g", 900.0)   // cents 90000 -> digit 9
    ).toDF("grp", "v")
    val rows = Validate.benford(vals, "grp", "v")
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5))).toMap
    // n = 4 positive-cent rows; dev = |1000*obs - n*permille|
    assert(rows(1) == ((2L, 4L, 301, 796L)))
    assert(rows(2) == ((1L, 4L, 176, 296L)))
    assert(rows(9) == ((1L, 4L, 46, 816L)))
    assert(rows.size == 3, "unobserved digits are absent, not zero rows")
  }
}
