package graft.model

import graft.SparkSpec

/** Dictionary-driven catalog layer (S2/S8) over the real reference
  * dictionary files.
  */
class CatalogsSpec extends SparkSpec {

  private val dictDir = "/root/reference/dictionary"

  test("TableCatalog loads the 87-dataset name mapping") {
    val cat = Catalogs.load(dictDir)
    assert(cat.datasets.size == 87)
    val byId = cat.idToName
    assert(byId("E10000001") == "temp_max_absoluta")
    assert(cat.nameToId("temp_max_absoluta") == "E10000001")
    // categories split air/water like the reference inventory
    val cats = cat.datasets.groupBy(_.categoria).view.mapValues(_.size).toMap
    assert(cats("Aire") == 71 && cats("Agua") == 16, cats.toString)
  }

  test("station-column registry and per-table mapping are data-driven") {
    val cat = Catalogs.load(dictDir)
    assert(cat.stationColumnFor("temp_max_absoluta") ==
      "DTI_CL_ESTACIONES_METEO")
    // registry preserves dictionary order — it is the fallback probe
    // order, and includes CL_T017ESTACION_SHOA which the DTI_-prefix
    // fallback scan can never find (doesn't start with DTI_)
    assert(cat.stationColumns.head == "DTI_CL_EST_MONITOREO_AIRE")
    assert(cat.stationColumns.contains("CL_T017ESTACION_SHOA"))
    assert(cat.stationColumnTypes.toMap.apply("DTI_CL_T010EST_NIVO") ==
      "Estaciones nivométricas")
    assert(cat.stationColumnFor.size == 87)
    // per-table mapping wins over registry order: the dual-station
    // caudal table probes its mapped fluviométricas column first
    assert(cat.stationProbeOrder("caudal_medio_de_aguas_corrientes").head ==
      "DTI_CL_ESTACIONES_FLUVIOMETRICAS")
  }

  test("pathFor is the step-2 rename as pure metadata") {
    val cat = Catalogs.load(dictDir)
    assert(cat.pathFor("/data/raw", "temp_max_absoluta") ==
      "/data/raw/temp_max_absoluta.csv")
  }

  test("stationCatalog: 98 stations, exact reference column order") {
    val df = Catalogs.stationCatalog(spark, dictDir)
    assert(df.columns.toSeq == Seq("nombre", "latitud", "longitud",
      "numero_region", "nombre_region", "descripcion"))
    assert(df.count() == 98)
    val r = df.filter(df("nombre") === "21 de mayo").collect()(0)
    assert(r.getAs[Double]("latitud") == -33.036)
    assert(r.getAs[Long]("numero_region") == 5L)
    assert(r.getAs[String]("nombre_region") == "Valparaíso")
  }
}
