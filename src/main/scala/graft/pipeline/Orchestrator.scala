package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Csv

/** Pipeline orchestration mirroring pipeline_orchestrator.py:71-315 —
  * stages 3→5 composed as one lazy lineage per view (no intermediate
  * CSV materialization; the reference re-reads files between every
  * step), with per-stage JSON-able metrics.
  *
  * Step 1 (Playwright scraping) is external acquisition, not a Spark
  * operator (SURVEY.md §2.1 S3) — the orchestrator starts at the file
  * layer. Step 2 (renames) is absorbed by the name→path catalog.
  * Step 6 (JDBC) is [[graft.io.Jdbc]], pluggable as the sink. Step 7
  * (report merge) is [[RunReport.toJson]].
  */
object Orchestrator {

  /** Entity-catalog source mapping
    * (steps/step5_create_views.py:564-577 + cuenca branch :550-562).
    */
  val entitySources: Seq[(String, String, String, String)] = Seq(
    ("num_glaciares_por_cuenca", "Cuencas", "Cuenca Hidrográfica",
      "Cuenca hidrográfica - Monitoreo de glaciares y balance hídrico regional"),
    ("coliformes_fecales_en_matriz_biologica", "Estaciones POAL",
      "Estación Costera - Coliformes Biológicos",
      "Estación de monitoreo costero - Análisis de coliformes fecales en organismos marinos"),
    ("coliformes_fecales_en_matriz_acuosa", "Estaciones POAL",
      "Estación Costera - Coliformes Acuosos",
      "Estación de monitoreo costero - Análisis de coliformes fecales en agua de mar"),
    ("metales_totales_en_la_matriz_sedimentaria", "Estaciones POAL",
      "Estación Costera - Metales Sedimentos",
      "Estación de monitoreo costero - Análisis de metales pesados en sedimentos marinos"),
    ("metales_disueltos_en_la_matriz_acuosa", "Estaciones POAL",
      "Estación Costera - Metales Disueltos",
      "Estación de monitoreo costero - Análisis de metales disueltos en agua de mar"),
    ("caudal_medio_de_aguas_corrientes", "Estaciones Fluviométricas",
      "Estación Fluviométrica",
      "Estación de medición de ríos - Monitoreo de caudal y flujo de agua"),
    ("cantidad_de_agua_caida", "Estaciones meteorológicas DMC",
      "Estación Meteorológica",
      "Estación meteorológica - Medición de lluvias y precipitaciones"),
    ("evaporacion_real_por_estacion", "Estación", "Estación de Evaporación",
      "Estación de evaporación - Medición de pérdida de agua por evaporación"),
    ("volumen_del_embalse_por_embalse", "Embalse", "Embalse",
      "Embalse o represa - Monitoreo de almacenamiento de agua"),
    ("altura_nieve_equivalente_en_agua", "Estaciones nivométricas",
      "Estación Nivométrica",
      "Estación de medición de nieve - Monitoreo de acumulación de nieve en cordillera"),
    ("nivel_estatico_de_aguas_subterraneas", "Estaciones Pozo",
      "Pozo de Monitoreo",
      "Pozo de monitoreo - Medición de nivel de aguas subterráneas (napas)"),
    ("temp_superficial_del_mar", "Estación ambiental SHOA",
      "Estación Oceanográfica",
      "Estación oceanográfica - Medición de temperatura del mar"),
    ("nivel_medio_del_mar", "Estación ambiental SHOA",
      "Estación Oceanográfica",
      "Estación oceanográfica - Medición de nivel del mar"),
  )

  final case class ViewResult(name: String, status: String, rows: Long,
                              columns: Seq[String])
  final case class RunReport(views: Seq[ViewResult]) {
    def toJson: String = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      views.map { v =>
        s"""{"view":${q(v.name)},"status":${q(v.status)},"rows":${v.rows},""" +
          s""""columns":[${v.columns.map(q).mkString(",")}]}"""
      }.mkString("""{"views":[""", ",", "]}")
    }
  }

  /** Run stages 3–5 over a loader (table name → cleaned DataFrame),
    * writing each view as CSV under `outDir/views`. `filterStations`
    * applies step 4 semantics before consolidation, as the pipeline
    * order prescribes (step 4 runs before step 5).
    *
    * Throughput design (87 files / 33 views on one session):
    * - cleaned members are persisted and memoized — each member feeds
    *   the spine, label maps, and pivot (3–4 plan subtrees), and
    *   re-scanning CSV per subtree dominated the wall-clock;
    * - each view DataFrame is persisted so the CSV write and the
    *   report count() execute the plan once, not twice;
    * - views run on `parallelism` driver threads: the per-view jobs
    *   are small, so concurrent scheduling keeps the executor pool
    *   busy instead of paying 33 × sequential job latency.
    */
  def run(spark: SparkSession, loadRaw: String => Option[DataFrame],
          outDir: String, filterStations: Boolean = true,
          singleFileCsv: Boolean = false, parallelism: Int = 8): RunReport = {
    val cache = new scala.collection.concurrent.TrieMap[String, Option[DataFrame]]
    val load: String => Option[DataFrame] = name =>
      cache.getOrElseUpdate(name,
        loadRaw(name).map { df =>
          val noFlags = Steps.removeFlagColumns(df)
          val cleaned =
            if (filterStations) Steps.filterSparseStations(noFlags)._1
            else noFlags
          cleaned.persist()
        })

    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)

    def inParallel[A, B](items: Seq[A])(f: A => B): Seq[B] =
      Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)

    val consolidated = inParallel(Views.airViews ++ Views.waterConsolidatedViews) { v =>
      Consolidate.consolidate(v, load) match {
        case Some(df0) =>
          val df = df0.persist()
          Csv.write(df, s"$outDir/views/${v.name}", singleFileCsv)
          val r = ViewResult(v.name, "success", df.count(), df.columns.toSeq)
          df.unpersist(blocking = false)
          r
        case None => ViewResult(v.name, "error", 0L, Nil)
      }
    }

    val simple = inParallel(Views.waterSimpleTables) { t =>
      load(t) match {
        case Some(df0) =>
          val view = Consolidate.simpleWaterView(df0).persist()
          Csv.write(view, s"$outDir/views/v_$t", singleFileCsv)
          val r = ViewResult(s"v_$t", "success", view.count(), view.columns.toSeq)
          view.unpersist(blocking = false)
          r
        case None => ViewResult(s"v_$t", "error", 0L, Nil)
      }
    }
    pool.shutdown()

    val entities = Steps.entityCatalog(entitySources.flatMap {
      case (table, colName, tipo, desc) =>
        loadRaw(table).map(df => (df, colName, tipo, desc))
    }).map { df =>
      Csv.write(df, s"$outDir/views/v_entidades_agua", singleFileCsv)
      ViewResult("v_entidades_agua", "success", df.count(), df.columns.toSeq)
    }.toSeq

    cache.values.flatten.foreach(_.unpersist(blocking = false))
    RunReport(consolidated ++ simple ++ entities)
  }
}
