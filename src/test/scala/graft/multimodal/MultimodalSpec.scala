package graft.multimodal

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def asset(id: Long, bytes: Array[Byte], w: Int = 4, h: Int = 4,
                    durMs: Long = 100L): MediaAsset =
    MediaAsset(id, "image", bytes, MediaMeta(w, h, durMs, "stub"))

  test("binaryFile ingest: glob prunes, content round-trips, stable ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_")
    val payload = Array[Byte](1, 2, 3, 4, 5)
    java.nio.file.Files.write(dir.resolve("a.jpg"), payload)
    java.nio.file.Files.write(dir.resolve("b.jpg"), Array[Byte](9, 9))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array[Byte](7))
    val ingested = Multimodal.ingestFiles(spark, dir.toString,
      "*.jpg", "image").collect()
    assert(ingested.length == 2, "glob must exclude skip.txt before read")
    val byBytes = ingested.find(_.content.sameElements(payload))
    assert(byBytes.isDefined, "payload bytes must round-trip exactly")
    // id = hash of the file NAME: re-ingest yields identical ids
    val again = Multimodal.ingestFiles(spark, dir.toString,
      "*.jpg", "image").collect()
    assert(again.map(_.asset_id).sorted.sameElements(
      ingested.map(_.asset_id).sorted))
    // ingested assets flow straight into the feature extractor
    val feats = Multimodal.extractFeatures(
      Multimodal.ingestFiles(spark, dir.toString, "*.jpg", "image"))
      .collect()
    assert(feats.map(_.n_bytes).sorted.sameElements(Array(2L, 5L)))
  }

  private lazy val assets = Seq(
    asset(1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
    asset(2L, Array[Byte](9, 10, 11, 12)),
    asset(3L, Array.emptyByteArray)).toDS()

  test("feature extraction: deterministic luma stats, payload dropped") {
    val f = extractFeatures(assets).collect().map(x => x.asset_id -> x).toMap
    assert(f(1L).n_bytes == 8 && f(2L).n_bytes == 4)
    assert(f(3L).luma_mean == 0.0 && f(3L).luma_hist.sum == 0)
    assert(f(1L).luma_hist.sum == 8, "every pixel lands in one histogram bin")
    // determinism: same input, same features across runs
    val again = extractFeatures(assets).collect().map(x => x.asset_id -> x).toMap
    assert(f(1L).luma_mean == again(1L).luma_mean)
    assert(f(1L).luma_hist.toSeq == again(1L).luma_hist.toSeq)
  }

  test("batch shape: grouped(batchSize) covers every row exactly once") {
    val many = (1L to 100L).map(i => asset(i, Array[Byte](i.toByte))).toDS()
    val out = extractFeatures(many, batchSize = 7).collect()
    assert(out.map(_.asset_id).sorted.toSeq == (1L to 100L))
  }

  test("resize updates payload size and metadata") {
    val out = resizeAssets(assets.filter(_.asset_id == 1L), 2, 2)
      .collect().head
    assert(out.meta.width == 2 && out.meta.height == 2)
    assert(out.content.length == 2, "8 bytes * (2*2)/(4*4) = 2")
  }

  test("frame sampling: one row per interval, ordered timestamps") {
    val frames = sampleFrames(assets.filter(_.asset_id == 1L), everyMs = 25L)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 4, "100ms / 25ms = 4 frames")
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 25L, 50L, 75L))
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("dHash: identical payloads pair at hamming 0, empty never pairs") {
    val payload = Array.tabulate[Byte](200)(i => (i * 7 % 120).toByte)
    val other = Array.tabulate[Byte](200)(i => ((i * 13 + 5) % 120).toByte)
    val ds = Seq(asset(1L, payload), asset(2L, payload.clone()),
      asset(3L, other), asset(4L, Array.emptyByteArray)).toDS()
    val pairs = mediaNearDupPairs(ds, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0, "identical payloads must pair at 0")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L),
      "empty payload has no fingerprint and never pairs")
    // dHash determinism: re-running reproduces bit-identical hashes
    val h1 = dHash(ds).collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val h2 = dHash(ds).collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(h1 == h2)
    assert(h1(4L) == null, "empty payload → null hash")
  }

  test("asAssets wraps a text column as typed binary assets") {
    val docs = Seq((10L, "hello world")).toDF("doc_id", "text")
    val a = asAssets(docs, "doc_id", "text", "text_blob").collect().head
    assert(a.asset_id == 10L && a.media_type == "text_blob")
    assert(new String(a.content) == "hello world")
    assert(a.meta.durationMs == 110L)
  }
}
