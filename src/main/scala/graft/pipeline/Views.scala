package graft.pipeline

/** The 33-view inventory of the reference, as data
  * (steps/step5_create_views.py:41-194 air, :197-216 consolidated
  * water, :219-230 simple water; the v_estaciones /
  * v_entidades_agua catalogs are built by
  * [[graft.model.Catalogs]] and [[Steps.entityCatalog]]). Member
  * order is semantic — the first member supplies the period-label
  * mapping (§2.10 quirk) — so these are ordered Seqs, never Maps.
  */
final case class ViewDef(
    name: String,
    tables: Seq[String],
    periodCol: String,
    periodName: String,
    stationCol: String,
    stationName: String,
    granularity: String,
    esAgua: Boolean = false,
    stationRename: Option[String] = None)

object Views {

  private def air(name: String, tables: Seq[String], periodCol: String,
                  periodName: String, stationCol: String, stationName: String,
                  gran: String): ViewDef =
    ViewDef(name, tables, periodCol, periodName, stationCol, stationName, gran)

  private val meteo = "Estaciones meteorológicas DMC"
  private val aire = "Estaciones de monitoreo del aire"
  private val estMeteo = "DTI_CL_ESTACIONES_METEO"
  private val estAire = "DTI_CL_EST_MONITOREO_AIRE"

  /** A pollutant's annual percentile family + its monthly mean. */
  private def pollutant(p: String, extra99: Boolean): Seq[ViewDef] = {
    val percs = Seq("perc50", "perc90", "perc95", "perc98") ++
      (if (extra99) Seq("perc99") else Nil)
    val minName = if (p == "so2") s"${p}_min_anual" else s"${p}_min_hor_anual"
    Seq(
      air(s"v_${p}_anual",
        Seq(s"${p}_max_hor_anual", minName) ++ percs.map(x => s"${p}_$x"),
        "DTI_CL_ANO", "anio", estAire, aire, "anual"),
      air(s"v_${p}_mensual", Seq(s"${p}_med_mens"),
        "DTI_CL_MES", "mes", estAire, aire, "mensual"))
  }

  val airViews: Seq[ViewDef] = Seq(
    air("v_temperatura",
      Seq("temp_max_absoluta", "temp_min_absoluta", "temp_max_med",
        "temp_min_med", "temp_med"),
      "DTI_CL_MES", "mes", estMeteo, meteo, "mensual"),
    air("v_humedad_radiacion_uv",
      Seq("humedad_rel_med_mens", "rad_global_med", "uvb_prom"),
      "DTI_CL_MES", "mes", estMeteo, meteo, "mensual")) ++
    pollutant("mp25", extra99 = false) ++
    pollutant("mp10", extra99 = false) ++
    pollutant("o3", extra99 = true) ++
    pollutant("so2", extra99 = true) ++
    pollutant("no2", extra99 = true) ++
    pollutant("co", extra99 = true) ++
    pollutant("no", extra99 = true) ++
    pollutant("nox", extra99 = true) :+
    air("v_num_eventos_de_olas_de_calor", Seq("num_eventos_de_olas_de_calor"),
      "DTI_CL_MES", "mes", estMeteo, meteo, "mensual")

  val waterConsolidatedViews: Seq[ViewDef] = Seq(
    ViewDef("v_mar_mensual",
      Seq("temp_superficial_del_mar", "nivel_medio_del_mar"),
      "DTI_CL_MES", "mes", "CL_T017ESTACION_SHOA", "Estación ambiental SHOA",
      "mensual", esAgua = true),
    ViewDef("v_glaciares_anual_cuenca",
      Seq("num_glaciares_por_cuenca", "superficie_de_glaciares_por_cuenca",
        "volumen_de_hielo_glaciar_estimado_por_cuenca",
        "volumen_de_agua_de_glaciares_estimada_por_cuenca"),
      "DTI_CL_ANO", "anio", "DTI_CL_CUENCAS", "Cuencas", "anual",
      esAgua = true,
      // declared but unused by the reference (§2.10: station column is
      // always renamed `estacion`, steps/step5_create_views.py:389-393)
      stationRename = Some("cuenca")))

  /** Tables converted 1:1 into `v_`-prefixed views (flags + DTI_
    * columns dropped, steps/step5_create_views.py:446-501).
    */
  val waterSimpleTables: Seq[String] = Seq(
    "coliformes_fecales_en_matriz_biologica",
    "coliformes_fecales_en_matriz_acuosa",
    "metales_totales_en_la_matriz_sedimentaria",
    "metales_disueltos_en_la_matriz_acuosa",
    "caudal_medio_de_aguas_corrientes",
    "cantidad_de_agua_caida",
    "evaporacion_real_por_estacion",
    "volumen_del_embalse_por_embalse",
    "altura_nieve_equivalente_en_agua",
    "nivel_estatico_de_aguas_subterraneas")

  val all: Seq[ViewDef] = airViews ++ waterConsolidatedViews
}
