package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing exercised over the harness data (document text
  * wrapped as binary payloads — the container has no real media).
  * Not SQL-expressible in DuckDB (partition-wise typed transforms), so
  * these carry no oracle entry: the driver records the weaker
  * rows-only check, and MultimodalSpec pins exact semantics.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // decode-stub feature extraction over binary payloads
    "q_media_features" -> ((s, d) => {
      val assets = Multimodal.asAssets(
        Tables.documents(s, d), "doc_id", "text", "text_blob")
      Multimodal.extractFeatures(assets).toDF()
        .select(col("asset_id"), col("n_bytes"), round(col("luma_mean"), 6)
          .as("luma_mean"))
        .orderBy("asset_id")
    }),

    // frame sampling: payload → per-frame rows
    "q_media_frames" -> ((s, d) => {
      val assets = Multimodal.asAssets(
        Tables.documents(s, d).filter(col("doc_id") < 50),
        "doc_id", "text", "video_stub")
      Multimodal.sampleFrames(assets, everyMs = 500L).toDF()
        .select("asset_id", "frame_idx", "ts_ms")
        .orderBy("asset_id", "frame_idx")
    }),
  )

  val oracleSql: Map[String, String] = Map.empty
}
