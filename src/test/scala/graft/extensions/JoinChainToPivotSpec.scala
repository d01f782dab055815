package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The join-chain→pivot rewrite: same rows as the untouched chain,
  * one Join in the optimized plan instead of n, off unless the conf
  * flag is set, and never fired for non-eligible right sides.
  */
class JoinChainToPivotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val facts = Seq(
    ("p1", "s1", "A", 1.0), ("p1", "s1", "B", 2.0), ("p1", "s2", "A", 3.0),
    ("p2", "s1", "B", 4.0), ("p2", "s2", "A", 5.0), ("p2", "s2", "B", 6.0),
    ("p3", "s1", "A", 7.0)).toDF("period", "station", "kind", "v")

  private def measure(kind: String, alias: String): DataFrame =
    facts.filter($"kind" === kind)
      .groupBy($"period".as("mp"), $"station".as("ms"))
      .agg(sum($"v").as(alias))
      .withColumnRenamed("mp", s"${alias}_p")
      .withColumnRenamed("ms", s"${alias}_s")

  private def chain: DataFrame = {
    val spine = facts.select("period", "station").distinct()
    Seq("a" -> "A", "b" -> "B", "c" -> "A").foldLeft(spine) {
      case (acc, (alias, kind)) =>
        val m = measure(kind, alias)
        acc.join(m,
          acc("period") === m(s"${alias}_p") &&
            acc("station") === m(s"${alias}_s"), "left")
          .drop(s"${alias}_p", s"${alias}_s")
    }.orderBy("period", "station")
  }

  private def joinCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private def withFlag[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.pivotRewrite", on.toString)
    try f finally spark.conf.unset("spark.graft.pivotRewrite")
  }

  test("rewrite preserves rows, nulls for missing members included") {
    val expected = withFlag(on = false) {
      assert(joinCount(chain) == 3, "3 left joins without the rule")
      chain.collect().map(_.toSeq).toSeq
    }
    val got = withFlag(on = true) {
      val df = chain
      assert(joinCount(df) == 1,
        s"chain must collapse to one join:\n${df.queryExecution.optimizedPlan}")
      df.collect().map(_.toSeq).toSeq
    }
    assert(got == expected)
    // p3/s1 exists only in kind A → b is null there; sanity-pin one row
    assert(expected.exists(r => r(0) == "p3" && r(3) == null && r(2) == 7.0))
  }

  test("no rewrite when a right side is not an aggregate on the keys") {
    withFlag(on = true) {
      val spine = facts.select("period", "station").distinct()
      // raw (non-aggregated) right side: 1:N join, must stay a join
      val raw = facts.select($"period".as("rp"), $"station".as("rs"), $"v")
      val m = measure("B", "b")
      val df = spine
        .join(raw, spine("period") === raw("rp") &&
          spine("station") === raw("rs"), "left")
        .join(m, spine("period") === m("b_p") &&
          spine("station") === m("b_s"), "left")
      assert(joinCount(df) == 2, "ineligible chain must keep its joins")
    }
  }

  test("no rewrite when members disagree on a payload slot's type") {
    withFlag(on = true) {
      val spine = facts.select("period", "station").distinct()
      val asDouble = measure("A", "a") // sum(double) → double
      val asCount = facts.filter($"kind" === "B")
        .groupBy($"period".as("b_p"), $"station".as("b_s"))
        .agg(count(lit(1)).as("b")) // → long, same slot position
      val df = spine
        .join(asDouble, spine("period") === asDouble("a_p") &&
          spine("station") === asDouble("a_s"), "left")
        .join(asCount, spine("period") === asCount("b_p") &&
          spine("station") === asCount("b_s"), "left")
      // coercing long through the double slot could corrupt values —
      // the chain must keep its joins
      assert(joinCount(df) == 2)
    }
  }

  test("no rewrite when the aggregate groups on extra columns") {
    withFlag(on = true) {
      val spine = facts.select("period", "station").distinct()
      // grouped on (period, station, kind) but joined on 2 keys → 1:N
      val over = facts.groupBy($"period".as("op"), $"station".as("os"),
        $"kind").agg(sum($"v").as("ov"))
      val m = measure("B", "b")
      val df = spine
        .join(over, spine("period") === over("op") &&
          spine("station") === over("os"), "left")
        .join(m, spine("period") === m("b_p") &&
          spine("station") === m("b_s"), "left")
      assert(joinCount(df) == 2)
      // and the fan-out rows are intact (kind A + kind B on p1/s1)
      assert(df.filter($"period" === "p1" && $"station" === "s1").count() == 2)
    }
  }
}
