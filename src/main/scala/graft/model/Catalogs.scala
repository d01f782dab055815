package graft.model

import java.io.File

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Dictionary-driven table catalog (SURVEY.md §2.1 S2/S8; §7 item 1).
  *
  * The reference wires its 87 datasets together through four JSON
  * dictionaries, each loaded at a different step:
  *  - `ine_catalog.json` — dataset id → display name/category/url
  *    (steps/step1_scraper.py:56-66);
  *  - `dataset_name_mapping.json` — id → snake_case standardized name
  *    (steps/step2_standardize_names.py:47-55); file renames become a
  *    pure metadata mapping here (S8 — no data movement);
  *  - `station_columns_mapping.json` — standardized name → station
  *    code column, plus the column-type registry
  *    (steps/step4_filter_stations.py:28-31);
  *  - `estaciones_aire_data.json` — the 98-row station catalog behind
  *    the `v_estaciones` view (steps/step5_create_views.py:503-548).
  *
  * All four are KB-sized config — parsed driver-side (Jackson, already
  * on Spark's classpath); only the station catalog becomes a
  * DataFrame, and it is dimension-sized (broadcast tier at any scale).
  */
final case class DatasetInfo(id: String, nombreOriginal: String,
                             nombreEstandarizado: String, categoria: String)

final case class TableCatalog(
    datasets: Seq[DatasetInfo],
    /** station-code column registry: (code column, readable label) in
      * dictionary order — order is semantic, it is the reference's
      * fallback probe order (steps/step4_filter_stations.py:62-64).
      */
    stationColumnTypes: Seq[(String, String)],
    /** standardized table name → its station code column. */
    stationColumnFor: Map[String, String]) {

  /** Known station-code columns, dictionary probe order. */
  def stationColumns: Seq[String] = stationColumnTypes.map(_._1)

  /** The reference's two-step detection
    * (steps/step4_filter_stations.py:42-66): the table's mapped column
    * first, then the registry in dictionary order — expressed as a
    * probe list for [[graft.pipeline.Schemas.findStationColumn]].
    */
  def stationProbeOrder(table: String): Seq[String] =
    (stationColumnFor.get(table).toSeq ++ stationColumns).distinct

  def idToName: Map[String, String] =
    datasets.map(d => d.id -> d.nombreEstandarizado).toMap

  def nameToId: Map[String, String] =
    datasets.map(d => d.nombreEstandarizado -> d.id).toMap

  /** Step-2 rename as metadata: the standardized table's path under a
    * raw stage directory (the reference renames the physical file; a
    * catalog lookup needs no data movement).
    */
  def pathFor(rawDir: String, table: String): String = s"$rawDir/$table.csv"
}

object Catalogs {

  private def mapper = new ObjectMapper()

  // keep the java LinkedHashMaps: their iteration order is the JSON
  // key order, which the probe list depends on — a Scala .toMap here
  // would silently shuffle it
  private def parse(path: String): java.util.Map[String, AnyRef] =
    mapper.readValue(new File(path), classOf[java.util.Map[String, AnyRef]])

  private def section(m: java.util.Map[String, AnyRef], key: String)
      : scala.collection.Map[String, AnyRef] =
    m.getOrDefault(key, new java.util.LinkedHashMap[String, AnyRef]())
      .asInstanceOf[java.util.Map[String, AnyRef]].asScala

  /** Load the full dictionary set from a directory holding the four
    * reference-layout JSON files.
    */
  def load(dictDir: String): TableCatalog = {
    val names = parse(s"$dictDir/dataset_name_mapping.json")
    val datasets = section(names, "mappings").toSeq.map { case (id, v) =>
      val m = v.asInstanceOf[java.util.Map[String, AnyRef]].asScala
      DatasetInfo(id,
        m.getOrElse("nombre_original", "").toString,
        m.getOrElse("nombre_estandarizado", "").toString,
        m.getOrElse("categoria", "").toString)
    }.sortBy(_.id)

    val stations = parse(s"$dictDir/station_columns_mapping.json")
    // Jackson yields LinkedHashMap — toSeq here preserves the file's
    // key order, which IS the reference's fallback probe order
    val types = section(stations, "station_column_types").toSeq
      .map { case (c, v) =>
        c -> v.asInstanceOf[java.util.Map[String, AnyRef]].asScala
          .getOrElse("nombre_legible", "").toString
      }
    val perTable = section(stations, "mappings").map { case (t, v) =>
      t -> v.asInstanceOf[java.util.Map[String, AnyRef]].asScala
        .getOrElse("station_column", "").toString
    }.toMap
    TableCatalog(datasets, types, perTable)
  }

  /** The `v_estaciones` station catalog: 98 air-quality stations with
    * the exact column order the reference materializes
    * (steps/step5_create_views.py:520 — nombre, latitud, longitud,
    * numero_region, nombre_region, descripcion).
    */
  def stationCatalog(spark: SparkSession, dictDir: String): DataFrame =
    spark.read.option("multiLine", "true")
      .json(s"$dictDir/estaciones_aire_data.json")
      .select(col("nombre"), col("latitud"), col("longitud"),
        col("numero_region"), col("nombre_region"), col("descripcion"))
}
