package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing exercised over the harness data (document text
  * wrapped as binary payloads — the container has no real media).
  *
  * Both queries carry REAL DuckDB oracles even though the transforms
  * are partition-wise typed Datasets: the stub codec is deterministic
  * over the payload bytes, so its rolling luma transform
  * (acc = (acc*31 + byte) & 0xff) is re-derivable in SQL — a
  * recursive CTE walks the hex-encoded payload byte by byte. Frame
  * sampling is closed-form (n = bytes*10/500 frames). This checks the
  * full chain: binary cast, byte-based duration metadata, per-asset
  * decode, row explosion.
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

    // scene boundaries: integer luma-mass jumps between frames
    "q_scene_changes" -> ((s, d) => {
      val assets = Multimodal.asAssets(
        Tables.documents(s, d).filter(col("doc_id") < 50),
        "doc_id", "text", "video_stub")
      Multimodal.sceneChanges(assets, everyMs = 500L, threshold = 200L)
        .orderBy("asset_id", "frame_idx")
    }),

    // perceptual near-dup: banded dHash candidates + exact hamming.
    // The corpus is augmented with clones of the 20 lowest doc_ids,
    // offset by max(doc_id)+1 (derived, not a literal — a fixed offset
    // silently collides with real docs once a scaled corpus crosses
    // it, and Spark + oracle would stay hash-equal through the bug):
    // a 60-bit dHash at hamming ≤ 3 only pairs near-identical payloads
    // (the 32-bit predecessor paired on random band collisions), so
    // without seeded clones a dup-free sf dir would make this oracle
    // vacuously 0-row
    "q_media_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val cloned = docs.filter(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + lit(off))
      val assets = Multimodal.asAssets(
        docs.unionByName(cloned), "doc_id", "text", "text_blob")
      Multimodal.mediaNearDupPairs(assets, maxDist = 3)
        .orderBy("id_a", "id_b")
    }),

    // resize then re-extract: payload truncated by the stub codec's
    // area ratio (64×64 → 32×32 keeps a quarter, min 1 byte), features
    // recomputed over the resized bytes
    "q_media_resize" -> ((s, d) => {
      val assets = Multimodal.asAssets(
        Tables.documents(s, d), "doc_id", "text", "image_stub")
      Multimodal.extractFeatures(Multimodal.resizeAssets(assets, 32, 32))
        .toDF()
        .select(col("asset_id"), col("n_bytes"),
          round(col("luma_mean"), 6).as("luma_mean"))
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

  val oracleSql: Map[String, String] = Map(
    // the stub codec's luma plane is acc_i = (acc_{i-1}*31 + byte_i)
    // & 0xff from acc_0 = 17; luma_mean = sum(acc_i)/n. The recursive
    // CTE replays exactly that fold over the hex-encoded UTF-8 bytes.
    "q_media_features" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, 0 AS pos, 17 AS acc, CAST(0 AS BIGINT) AS s, n
        |  FROM b
        |  UNION ALL
        |  SELECT r.doc_id, r.pos + 1,
        |    (r.acc * 31 + CAST('0x' || substr(b.hx, r.pos*2+1, 2) AS INT)) & 255,
        |    r.s + ((r.acc * 31 + CAST('0x' || substr(b.hx, r.pos*2+1, 2) AS INT)) & 255),
        |    r.n
        |  FROM r JOIN b USING (doc_id) WHERE r.pos < r.n)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_bytes,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE CAST(s AS DOUBLE)/n END, 6)
        |    AS luma_mean
        |FROM r WHERE pos = n ORDER BY asset_id""".stripMargin,

    // frame i covers luma[off, off+16), off = (i*500) % n; its mass is
    // an exact integer sum from the same fold rows; boundaries via lag
    "q_scene_changes" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id < 50),
        |r AS (
        |  SELECT doc_id, 0 AS pos, 17 AS acc, n FROM b
        |  UNION ALL
        |  SELECT r.doc_id, r.pos + 1,
        |    (r.acc * 31 + CAST('0x' || substr(b.hx, r.pos*2+1, 2) AS INT)) & 255,
        |    r.n
        |  FROM r JOIN b USING (doc_id) WHERE r.pos < r.n),
        |fidx AS (SELECT b.doc_id, b.n, t.i
        |  FROM b, generate_series(0, 100000) t(i)
        |  WHERE (b.n * 10) // 500 >= 1 AND t.i < (b.n * 10) // 500),
        |fr AS (SELECT doc_id, i, i * 500 AS ts,
        |    CAST((i * 500) % greatest(1, n) AS INT) AS off, n
        |  FROM fidx),
        |fsums AS (SELECT f.doc_id, f.i, f.ts,
        |    CAST(coalesce(sum(r.acc), 0) AS BIGINT) AS fsum
        |  FROM fr f LEFT JOIN r ON r.doc_id = f.doc_id
        |    AND r.pos BETWEEN f.off + 1 AND least(f.off + 16, f.n)
        |  GROUP BY 1, 2, 3),
        |sc AS (SELECT doc_id, i, ts, fsum,
        |    lag(fsum) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM fsums)
        |SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_idx,
        |  ts AS ts_ms, fsum
        |FROM sc
        |WHERE prev IS NULL OR abs(fsum - prev) > 200
        |ORDER BY asset_id, frame_idx""".stripMargin,

    // dHash mirror: the same rolling-luma fold, then 61 sampled
    // positions, 60 packed greater-than bits, 4x15-bit band candidates
    // (band value space 32768 — see Multimodal.mediaNearDupPairs for
    // why 8-bit bands saturate at corpus scale), exact hamming via
    // bit_count(xor)
    "q_media_neardup" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), text
        |  FROM documents WHERE doc_id < 20),
        |b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM docs),
        |r AS (
        |  SELECT doc_id, 0 AS pos, 17 AS acc, n FROM b
        |  UNION ALL
        |  SELECT r.doc_id, r.pos + 1,
        |    (r.acc * 31 + CAST('0x' || substr(b.hx, r.pos*2+1, 2) AS INT)) & 255,
        |    r.n
        |  FROM r JOIN b USING (doc_id) WHERE r.pos < r.n),
        |samp AS MATERIALIZED (SELECT b.doc_id, t.i,
        |    CAST((t.i * (b.n - 1)) // 60 AS INT) AS sj
        |  FROM b, generate_series(0, 60) t(i) WHERE b.n >= 1),
        |v AS MATERIALIZED (SELECT s.doc_id, s.i, r.acc AS val
        |  FROM samp s JOIN r ON r.doc_id = s.doc_id AND r.pos = s.sj + 1),
        |dh AS MATERIALIZED (SELECT a.doc_id,
        |    CAST(coalesce(sum(CASE WHEN b2.val > a.val
        |      THEN CAST(1 AS BIGINT) << a.i ELSE 0 END), 0) AS BIGINT)
        |      AS dhash
        |  FROM v a JOIN v b2 ON b2.doc_id = a.doc_id AND b2.i = a.i + 1
        |  WHERE a.i < 60 GROUP BY 1),
        |bm AS MATERIALIZED (SELECT doc_id, t.b,
        |    (dhash >> (15 * t.b)) & 32767 AS bk
        |  FROM dh, generate_series(0, 3) t(b)),
        |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bm x JOIN bm y ON y.b = x.b AND y.bk = x.bk
        |    AND x.doc_id < y.doc_id)
        |SELECT c.id_a, c.id_b,
        |  CAST(bit_count(xor(ha.dhash, hb.dhash)) AS INT) AS hamming
        |FROM cand c
        |JOIN dh ha ON ha.doc_id = c.id_a
        |JOIN dh hb ON hb.doc_id = c.id_b
        |WHERE bit_count(xor(ha.dhash, hb.dhash)) <= 3
        |ORDER BY c.id_a, c.id_b""".stripMargin,

    // resize truncates the payload to the area ratio (min 1 byte);
    // the same rolling-luma CTE just stops at the resized length
    "q_media_resize" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         greatest(1, (octet_length(encode(text)) * 1024) // 4096)
        |           AS n
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, 0 AS pos, 17 AS acc, CAST(0 AS BIGINT) AS s, n
        |  FROM b
        |  UNION ALL
        |  SELECT r.doc_id, r.pos + 1,
        |    (r.acc * 31 + CAST('0x' || substr(b.hx, r.pos*2+1, 2) AS INT)) & 255,
        |    r.s + ((r.acc * 31 + CAST('0x' || substr(b.hx, r.pos*2+1, 2) AS INT)) & 255),
        |    r.n
        |  FROM r JOIN b USING (doc_id) WHERE r.pos < r.n)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_bytes,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE CAST(s AS DOUBLE)/n END, 6)
        |    AS luma_mean
        |FROM r WHERE pos = n ORDER BY asset_id""".stripMargin,

    // frame sampling is closed-form: durationMs = bytes*10, one frame
    // every 500 ms, frame i at ts i*500
    "q_media_frames" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0,
        |      (octet_length(encode(text)) * 10) // 500 - 1)) AS i
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_idx,
        |  CAST(i * 500 AS BIGINT) AS ts_ms
        |FROM f ORDER BY asset_id, frame_idx""".stripMargin)
}
