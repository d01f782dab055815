package graft.io

import graft.SparkSpec

class MergeTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_mergespec_${tag}_${System.nanoTime()}"
    p
  }

  test("bootstrap insert, then update/insert/delete in one batch") {
    val path = freshPath("basic")
    MergeTable.merge(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k"))
    MergeTable.merge(spark, path,
      Seq((2L, "B", false), (4L, "d", false), (3L, "x", true))
        .toDF("k", "v", "del"),
      Seq("k"), deleteCol = Some("del"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 4L -> "d"), s"got $out")
  }

  test("merge is idempotent for the same update batch") {
    val path = freshPath("idem")
    MergeTable.merge(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val batch = Seq((1L, "z", false), (2L, "y", false)).toDF("k", "v", "del")
    MergeTable.merge(spark, path, batch, Seq("k"), Some("del"))
    MergeTable.merge(spark, path, batch, Seq("k"), Some("del"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "z", 2L -> "y"), s"got $out")
  }

  test("NULL delete flag means update, not delete") {
    val path = freshPath("nullflag")
    MergeTable.merge(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    // nullable flag (e.g. from a left join): NULL must behave as false
    MergeTable.merge(spark, path,
      Seq((1L, "A", None: Option[Boolean]), (2L, "x", Some(true)))
        .toDF("k", "v", "del"),
      Seq("k"), deleteCol = Some("del"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "A"), s"got $out")
  }

  test("staged swap recovers from a dead writer's leftover side paths") {
    val path = freshPath("leftover")
    MergeTable.merge(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    // garbage a crashed previous swap could leave behind
    Seq((9L, "stale")).toDF("k", "v").write.parquet(path + "__stage")
    Seq((8L, "older")).toDF("k", "v").write.parquet(path + "__old")
    MergeTable.merge(spark, path,
      Seq((2L, "b", false)).toDF("k", "v", "del"), Seq("k"), Some("del"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b"), s"got $out")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__stage")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__old")))
  }

  test("merge after a mid-swap crash RECOVERS the table (no silent loss)") {
    val path = freshPath("crash")
    MergeTable.merge(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    // simulate death BETWEEN the two swap renames: table moved aside,
    // nothing live at path
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
    // the next merge must restore the previous table FIRST — the old
    // behavior took the bootstrap branch and kept only the batch
    MergeTable.merge(spark, path,
      Seq((3L, "c", false)).toDF("k", "v", "del"), Seq("k"), Some("del"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b", 3L -> "c"),
      s"pre-crash rows must survive: $out")
  }

  test("incremental refreshes keep the NULL group honest") {
    // a changed fact whose group is NULL must mark the NULL group
    // touched — null-unsafe joins would leave its old aggregate stale
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    def aggOf(df: DataFrame) = df.groupBy("g")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
    val oldSnap = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 5L),
      (3L, Option.empty[String], 7L)).toDF("k", "g", "x")
    // k=2's value changes INSIDE the null group
    val newSnap = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 50L),
      (3L, Option.empty[String], 7L)).toDF("k", "g", "x")
    val diff = MergeTable.diffSnapshots(oldSnap, newSnap, Seq("k"))
    val got = MergeTable.incrementalAggRefresh(aggOf(oldSnap), oldSnap,
      newSnap, diff, Seq("k"), Seq("g"))(aggOf)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    val want = aggOf(newSnap)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want, s"refresh $got != full recompute $want")
  }

  test("diffSnapshots classifies changes and is merge's inverse") {
    val path = freshPath("diff")
    val oldSnap = Seq(1L -> Some("a"), 2L -> Some("b"), 3L -> Some("c"),
      5L -> (None: Option[String]), 6L -> (None: Option[String]))
      .toDF("k", "v")
    val newSnap = Seq(1L -> Some("a"), 2L -> Some("B"), 4L -> Some("d"),
      5L -> (None: Option[String]), 6L -> Some("x"))
      .toDF("k", "v")
    val diff = MergeTable.diffSnapshots(oldSnap, newSnap, Seq("k"))
    val types = diff.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged, 5 null==null unchanged — both absent; 6 null->x is
    // an update only because the compare is null-safe
    assert(types == Map(2L -> "update", 3L -> "delete", 4L -> "insert",
      6L -> "update"), s"got $types")
    // applying the diff as a merge batch reproduces the new snapshot
    oldSnap.write.parquet(path)
    MergeTable.merge(spark, path,
      diff.withColumn("__del", $"change_type" === "delete")
        .drop("change_type"),
      Seq("k"), deleteCol = Some("__del"))
    val merged = spark.read.parquet(path)
      .as[(Long, Option[String])].collect().toSet
    val expected = newSnap.as[(Long, Option[String])].collect().toSet
    assert(merged == expected, s"merged $merged != new $expected")
  }

  test("incrementalAggRefresh == full recompute, incl. vanished groups") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    // groups: g1 updated (fact changes), g2 untouched, g3 vanishes
    // entirely (all facts deleted), g4 newly inserted, and key 6
    // MIGRATES g5 → g1 (the diff row carries only the NEW group, so
    // the departed g5 must be marked touched via the old snapshot)
    val oldSnap = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 5L),
      (4L, "g3", 7L), (6L, "g5", 3L)).toDF("k", "grp", "x")
    val newSnap = Seq((1L, "g1", 11L), (2L, "g1", 20L), (3L, "g2", 5L),
      (5L, "g4", 9L), (6L, "g1", 3L)).toDF("k", "grp", "x")
    val aggOf = (df: DataFrame) => df.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val diff = MergeTable.diffSnapshots(oldSnap, newSnap, Seq("k"))
    val refreshed = MergeTable.incrementalAggRefresh(
      aggOf(oldSnap), oldSnap, newSnap, diff, Seq("k"), Seq("grp"))(aggOf)
      .as[(String, Long, Long)].collect().toSet
    val full = aggOf(newSnap).as[(String, Long, Long)].collect().toSet
    assert(refreshed == full, s"refresh $refreshed != full $full")
    assert(!refreshed.exists(_._1 == "g3"), "vanished group must drop out")
    assert(!refreshed.exists(_._1 == "g5"),
      "group a fact migrated OUT of must not carry a stale aggregate")
  }

  test("incrementalJoinAggRefresh: dim-side groups, fact migration refreshes both") {
    val dims = Seq(("A", "X"), ("B", "Y"), ("C", "Z"))
      .toDF("dimkey", "grp")
    def enrich(f: org.apache.spark.sql.DataFrame) = f.join(dims, "dimkey")
    def agg(f: org.apache.spark.sql.DataFrame) = f.groupBy("grp")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"v").as("total"))
    // old: fact 1 in A(X), fact 2 in A(X), fact 3 in C(Z)
    val oldF = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "C", 5L))
      .toDF("id", "dimkey", "v")
    // new: fact 1 MIGRATES to B(Y); fact 2 value changes; fact 3 (Z)
    // untouched — its view row must carry over, not recompute
    val newF = Seq((1L, "B", 10L), (2L, "A", 25L), (3L, "C", 5L))
      .toDF("id", "dimkey", "v")
    val diff = MergeTable.diffSnapshots(oldF, newF, Seq("id"))
    val out = MergeTable.incrementalJoinAggRefresh(
      agg(enrich(oldF)), oldF, newF, diff, Seq("id"), Seq("grp"))(
      enrich)(agg)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // invariant: refresh ≡ full recompute over the new snapshot
    val full = agg(enrich(newF))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == full, s"refresh $out != full $full")
    assert(out == Map("X" -> (1L, 25L), "Y" -> (1L, 10L), "Z" -> (1L, 5L)))
  }

  test("delete of a never-inserted key is a no-op, not an error") {
    val path = freshPath("ghost")
    MergeTable.merge(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    MergeTable.merge(spark, path,
      Seq((99L, "ghost", true)).toDF("k", "v", "del"), Seq("k"), Some("del"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a"), s"got $out")
  }
}
