package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("sanitizeFilename strips specials, collapses whitespace, truncates") {
    val out = Seq("Temperatura máxima (°C) / mensual!",
      "a" * 150).toDF("name")
      .select(Scalars.sanitizeFilename($"name", 100).as("s"))
      .as[String].collect()
    assert(out(0) == "Temperatura_máxima_C_mensual")
    assert(out(1).length == 100)
  }

  test("nanToNull maps NaN to null, keeps values") {
    val out = Seq(1.0, Double.NaN, 3.0).toDF("v")
      .select(Scalars.nanToNull($"v").as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(1.0), None, Some(3.0)))
  }

  test("pct rounds to scale; zero total → NULL (ANSI mode, not a throw)") {
    val out = Seq((87L, 90L), (5L, 0L)).toDF("ok", "total")
      .select(Scalars.pct($"ok", $"total").as("p"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(96.67), None))
  }
}
