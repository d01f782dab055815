package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Catalogs

/** Dictionary-catalog queries (SURVEY.md §2.1 S2): the station catalog
  * behind the reference's `v_estaciones` view, read from the
  * dictionary JSON exactly like steps/step5_create_views.py:503-548.
  * The oracle reads the SAME file through DuckDB's read_json_auto, so
  * the check covers the multiLine JSON scan, the column ordering, and
  * the inferred types (double lat/lon, bigint region).
  */
object CatalogQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The reference dictionary directory; override for other layouts. */
  val DictDir: String =
    sys.env.getOrElse("GRAFT_DICT_DIR", "/root/reference/dictionary")

  val queries: Map[String, Q] = Map(
    "q_station_catalog" -> ((s, _) =>
      Catalogs.stationCatalog(s, DictDir).orderBy("nombre")))

  val oracleSql: Map[String, String] = Map(
    "q_station_catalog" ->
      s"""SELECT nombre, latitud, longitud, numero_region, nombre_region,
         |  descripcion
         |FROM read_json_auto('$DictDir/estaciones_aire_data.json')
         |ORDER BY nombre""".stripMargin)
}
