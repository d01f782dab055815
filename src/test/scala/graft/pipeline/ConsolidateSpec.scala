package graft.pipeline

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Golden test of the view-consolidation core over F1/F6-shaped
  * fixtures (FIXTURES.md): pins the §2.10 quirks — first-member-only
  * period labels, all-member station labels, sparse-station
  * non-null-count threshold, missing-member tolerance, Año↔anio
  * variant mutation.
  */
class ConsolidateSpec extends SparkSpec {
  import spark.implicits._

  private def f1(rows: Seq[(String, String, String, String, java.lang.Double)])
      : DataFrame =
    rows.toDF("DTI_CL_MES", "Mes", "DTI_CL_ESTACIONES_METEO",
      "Estaciones meteorológicas DMC", "Value")
      .withColumn("Flag Codes", org.apache.spark.sql.functions.lit("e"))
      .withColumn("Flags", org.apache.spark.sql.functions.lit("est"))

  private lazy val tempMax = f1(Seq(
    ("2021-01", "enero 2021", "S1", "Santiago", 30.0),
    ("2021-01", "enero 2021", "S2", "Valparaíso", 25.0),
    ("2021-02", "febrero 2021", "S1", "Santiago", 31.0)))

  // has a (period, station) pair absent from tempMax: 2021-03
  private lazy val tempMin = f1(Seq(
    ("2021-01", "enero 2021", "S1", "Santiago", 10.0),
    ("2021-03", "marzo 2021", "S1", "Santiago", 12.0),
    ("2021-03", "marzo 2021", "S3", "Concepción", 11.0)))

  private val view = ViewDef("v_test", Seq("tempMax", "tempMin", "missing"),
    "DTI_CL_MES", "mes", "DTI_CL_ESTACIONES_METEO",
    "Estaciones meteorológicas DMC", "mensual")

  private def tables: String => Option[DataFrame] = {
    case "tempMax" => Some(Steps.removeFlagColumns(tempMax))
    case "tempMin" => Some(Steps.removeFlagColumns(tempMin))
    case _ => None
  }

  test("wide view: spine, values, missing member skipped") {
    val out = Consolidate.consolidate(view, tables).get
    assert(out.columns.toSeq == Seq("mes", "estacion", "tempMax", "tempMin"),
      "missing member's column must be absent, order preserved")
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(rows.contains(("enero 2021", "Santiago", Some(30.0), Some(10.0))))
    assert(rows.contains(("febrero 2021", "Santiago", Some(31.0), None)))
    assert(rows.size == 5, "spine = distinct pairs across both members")
  }

  test("quirk: period labels only from the FIRST member") {
    val out = Consolidate.consolidate(view, tables).get
    // 2021-03 exists only in tempMin (2nd member) → NULL label; the
    // row survives with estacion label and value intact
    val marzo = out.filter(out("tempMin") === 12.0).collect()
    assert(marzo.length == 1)
    assert(marzo(0).isNullAt(0), "period label must be NULL for 2021-03")
    assert(marzo(0).getString(1) == "Santiago",
      "station label unions across ALL members")
  }

  test("quirk: station labels union across all members") {
    val out = Consolidate.consolidate(view, tables).get
    val conce = out.filter(out("estacion") === "Concepción").collect()
    assert(conce.length == 1, "S3 appears only in member 2 but keeps its label")
  }

  test("quirk: Año↔anio variant mutation, last member wins") {
    val a = Seq(("2020", "año 2020", "S1", "st", 1.0))
      .toDF("DTI_CL_ANO", "Año", "DTI_CL_CUENCAS", "Cuencas", "Value")
    val b = Seq(("2020", "año 2020 v2", "S1", "st", 2.0),
      ("2021", "año 2021", "S1", "st", 3.0))
      .toDF("DTI_CL_ANO", "anio", "DTI_CL_CUENCAS", "Cuencas", "Value")
    val v = ViewDef("v_anual", Seq("a", "b"), "DTI_CL_ANO", "anio",
      "DTI_CL_CUENCAS", "Cuencas", "anual")
    val out = Consolidate.consolidate(v, {
      case "a" => Some(a); case "b" => Some(b); case _ => None
    }).get
    // label column resolves to "anio" (b's variant), but the MAPPING
    // still comes from the first member (a) — which lacks "anio", so
    // no label join happens and the code column is renamed instead
    assert(out.columns.contains("anio"))
    val codes = out.select("anio").as[String].collect().toSet
    assert(codes == Set("2020", "2021"),
      "first member lacks the mutated label col → code column carries through")
  }

  test("sparse-station filter counts non-null values only") {
    // S1: 3 non-null → kept; S2: 4 rows, 3 non-null → borderline keep
    val df = f1(Seq(
      ("m1", "l1", "S1", "a", 1.0), ("m2", "l2", "S1", "a", 2.0),
      ("m3", "l3", "S1", "a", 3.0),
      ("m1", "l1", "S2", "b", 4.0), ("m2", "l2", "S2", "b", null),
      ("m3", "l3", "S2", "b", 5.0),
      ("m1", "l1", "S2", "b", 6.0)))
    val (kept, sparse) = Steps.filterSparseStations(df)
    val stations = kept.select("DTI_CL_ESTACIONES_METEO")
      .distinct().as[String].collect().toSet
    assert(stations == Set("S1", "S2"), "S2 has 3 non-null → borderline keep")
    // lower the data: S2 with only 2 non-null must go
    val df2 = f1(Seq(
      ("m1", "l1", "S1", "a", 1.0), ("m2", "l2", "S1", "a", 2.0),
      ("m3", "l3", "S1", "a", 3.0),
      ("m1", "l1", "S2", "b", 4.0), ("m2", "l2", "S2", "b", null),
      ("m3", "l3", "S2", "b", 5.0)))
    // S2: rows m1=4.0, m2=null, m3=5.0 → 2 non-null → eliminated
    val (kept2, sparse2) = Steps.filterSparseStations(df2, minRecords = 3L)
    val st2 = kept2.select("DTI_CL_ESTACIONES_METEO")
      .distinct().as[String].collect().toSet
    assert(st2 == Set("S1"))
    assert(sparse2.as[String].collect().toSeq == Seq("S2"))
  }

  test("empty/null station codes dropped before counting") {
    val df = f1(Seq(
      ("m1", "l1", "", "x", 1.0), ("m1", "l1", null, "y", 2.0),
      ("m1", "l1", "S1", "a", 1.0), ("m2", "l2", "S1", "a", 2.0),
      ("m3", "l3", "S1", "a", 3.0)))
    val (kept, _) = Steps.filterSparseStations(df)
    assert(kept.count() == 3)
  }

  test("simple water view drops flags and DTI_ columns") {
    val df = Seq(("d1", "día 1", "E1", "Embalse Uno", 7.5))
      .toDF("DTI_CL_DIA", "Día", "DTI_CL_T002A", "Embalse", "Value")
      .withColumn("Flags", org.apache.spark.sql.functions.lit("x"))
    val out = Consolidate.simpleWaterView(df)
    assert(out.columns.toSeq == Seq("Día", "Embalse", "Value"))
  }

  test("entity catalog: dedup on (nombre,tipo), sorted, 1-based ids") {
    val emb = Seq(("Embalse A", 1.0), ("Embalse B", 2.0), ("Embalse A", 3.0))
      .toDF("Embalse", "Value")
    val cuencas = Seq(("Cuenca Z", 1.0), ("Cuenca A", 2.0))
      .toDF("Cuencas", "Value")
    val out = Steps.entityCatalog(Seq(
      (cuencas, "Cuencas", "Cuenca Hidrográfica", "d1"),
      (emb, "Embalse", "Embalse", "d2"))).get
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, "Cuenca A", "Cuenca Hidrográfica"),
      (2L, "Cuenca Z", "Cuenca Hidrográfica"),
      (3L, "Embalse A", "Embalse"),
      (4L, "Embalse B", "Embalse")),
      s"got ${rows.toSeq}")
  }
}
