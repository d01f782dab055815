package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("dropColumns removes fixed + prefixed, tolerates missing") {
    val df = Seq((1, "a", "f", "x")).toDF("k", "val", "Flags", "DTI_x")
    val out = dropColumns(df, Seq("Flags", "Flag Codes"), Seq("DTI_"))
    assert(out.columns.toSeq == Seq("k", "val"))
  }

  test("filterNonEmpty drops null and empty-string rows") {
    val df = Seq(("s1", 1.0), ("", 2.0), (null, 3.0), ("s2", 4.0))
      .toDF("station", "v")
    assert(filterNonEmpty(df, "station").select("station")
      .as[String].collect().sorted.toSeq == Seq("s1", "s2"))
  }

  test("groupsWithAtLeast counts non-null values only (pandas count semantics)") {
    // s1 has 5 rows but only 2 non-null values -> below threshold 3.
    val df = Seq(
      ("s1", Some(1.0)), ("s1", None), ("s1", None), ("s1", Some(2.0)),
      ("s1", None),
      ("s2", Some(1.0)), ("s2", Some(2.0)), ("s2", Some(3.0))
    ).toDF("station", "Value")
    val kept = groupsWithAtLeast(df, Seq("station"), "Value", 3L)
    assert(kept.select("station").as[String].collect().toSeq == Seq("s2"))
  }

  test("dropSparseGroups keeps every row of the dense groups") {
    val df = Seq(
      ("s1", Some(1.0)), ("s1", None),
      ("s2", Some(1.0)), ("s2", Some(2.0)), ("s2", Some(3.0)), ("s2", None)
    ).toDF("station", "Value")
    val out = dropSparseGroups(df, Seq("station"), "Value", 3L)
    assert(out.count() == 4) // all 4 s2 rows, including the null one
    assert(out.select("station").distinct().as[String].collect().toSeq
      == Seq("s2"))
  }

  test("spine = union + distinct across members") {
    val a = Seq(("p1", "s1"), ("p1", "s2")).toDF("p", "s")
    val b = Seq(("p1", "s2"), ("p2", "s1")).toDF("p", "s")
    assert(spine(Seq(a, b), Seq("p", "s")).count() == 3)
  }

  test("wideViewPivot ≡ wideViewJoin when (keys, src) is unique") {
    val qty = Seq(("p1", "s1", 10.0), ("p1", "s2", 20.0), ("p2", "s1", 5.0))
      .toDF("p", "s", "v")
    val price = Seq(("p1", "s1", 1.5), ("p2", "s1", 2.5))
      .toDF("p", "s", "v")
    val sp = spine(Seq(qty, price), Seq("p", "s"))
    val joined = wideViewJoin(sp, Seq("p", "s"),
      Seq("qty" -> qty, "price" -> price))
    val pivoted = wideViewPivot(Seq("qty" -> qty, "price" -> price),
      Seq("p", "s"), "v")
    val j = joined.orderBy("p", "s").collect().toSeq
    val pv = pivoted.orderBy("p", "s").collect().toSeq
    assert(j == pv)
    assert(joined.columns.toSeq == Seq("p", "s", "qty", "price"))
  }

  test("dedupKeepFirst keeps the min-order row per key") {
    val df = Seq((3, "a", "x3"), (1, "a", "x1"), (2, "b", "x2"))
      .toDF("id", "k", "payload")
    val out = dedupKeepFirst(df, Seq("k"), "id")
    assert(out.orderBy("id").collect().toSeq ==
      Seq(Row(1, "a", "x1"), Row(2, "b", "x2")))
  }

  test("topK is deterministic under ties via tie-break column") {
    val df = Seq(("s3", 5L), ("s1", 5L), ("s2", 9L), ("s4", 1L))
      .toDF("k", "n")
    val out = topK(df, "n", "k", 3).select("k").as[String].collect().toSeq
    assert(out == Seq("s2", "s1", "s3"))
  }

  test("coerceNumeric casts iff parse ratio >= threshold") {
    val mostlyNum = Seq("1.5", "2", "n/a", "3").toDF("c")
    val coerced = coerceNumeric(mostlyNum, "c")
    assert(coerced.schema("c").dataType.typeName == "double")
    assert(coerced.filter($"c".isNull).count() == 1)
    val mostlyStr = Seq("a", "b", "c", "4").toDF("c")
    assert(coerceNumeric(mostlyStr, "c").schema("c").dataType.typeName
      == "string")
  }

  test("moneySum is exact and order-independent") {
    val df = (1 to 1000).map(i => i + 0.01).toDF("x").repartition(13)
    val got = df.agg(moneySum($"x")).as[Double].head()
    assert(got == (1 to 1000).map(BigDecimal(_) + BigDecimal("0.01")).sum
      .toDouble)
  }
}
