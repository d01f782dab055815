package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct items fit the capacity") {
    val items = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDS()
    val out = items.select(SpaceSaving.topItems(10).toColumn).head()
    assert(out == Seq(("a", 5L), ("b", 3L), ("c", 2L)), out)
  }

  test("guaranteed recall: items above N/capacity always surface") {
    // 1000 "hot" + 200 distinct cold singletons, capacity 50:
    // hot count 1000 > N/cap = 1200/50 = 24 → must be present,
    // reported count >= true count (overestimation only)
    val data = Seq.fill(1000)("hot") ++ (0 until 200).map(i => s"cold$i")
    val out = data.toDS()
      .repartition(8) // force partial sketches + merges
      .select(SpaceSaving.topItems(50).toColumn).head()
    val hot = out.find(_._1 == "hot")
    assert(hot.isDefined, s"hot item evicted: ${out.take(5)}")
    assert(hot.get._2 >= 1000L, s"count must overestimate, got ${hot.get}")
    assert(out.size <= 50)
  }

  test("works per group through a typed groupByKey aggregation") {
    val ds = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z")).toDS()
    val out = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(SpaceSaving.topItems(4).toColumn.name("top"))
      .collect().toMap
    assert(out("g1").head == ("x", 2L), out("g1"))
    assert(out("g2") == Seq(("z", 1L)), out("g2"))
  }

  test("merge keeps the largest counters with a stable tie-break") {
    val a = Map("x" -> (5L, 0L), "y" -> (1L, 0L))
    val b = Map("y" -> (1L, 0L), "z" -> (2L, 0L))
    val m = SpaceSaving.merge(a, b, capacity = 2)
    assert(m.keySet == Set("x", "y"), m) // y(2) ties z(2) → item order
  }
}
