package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

/** The REAL decoder leg: a checked-in PNG (test/resources/graft/
  * gradient.png — 16×12 RGB gradient, generated deterministically)
  * decoded through [[Multimodal.ImageIoCodec]] and pushed through the
  * same operators the stub codec serves. The stub remains the oracle
  * mode; this pins that a user with actual image bytes gets correct
  * pixels, features, fingerprints, and resizes.
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private val W = 16
  private val H = 12

  private lazy val pngBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/gradient.png")
    try in.readAllBytes() finally in.close()
  }

  // the generator's pixel formula, re-derived here from first
  // principles so the expected lumas are independent of the codec
  private def expectedLuma: Array[Int] =
    (for (y <- 0 until H; x <- 0 until W) yield {
      val r = (x * 16) % 256
      val g = (y * 21) % 256
      val b = (x * 7 + y * 13) % 256
      (299 * r + 587 * g + 114 * b) / 1000
    }).toArray

  private def meta = MediaMeta(W, H, 0L, "png")

  test("ImageIoCodec decodes the checked-in PNG to exact BT.601 lumas") {
    val luma = ImageIoCodec.decodeLuma(pngBytes, meta)
    assert(luma.toSeq == expectedLuma.toSeq)
  }

  test("extractFeatures over the real codec: exact mean and histogram") {
    val assets = Seq(
      MediaAsset(1L, "image", pngBytes, meta)).toDS()
    val f = extractFeatures(assets, ImageIoCodec).collect().head
    assert(f.n_bytes == pngBytes.length.toLong)
    val exp = expectedLuma
    assert(f.luma_mean == exp.map(_.toLong).sum.toDouble / exp.length)
    assert(f.luma_hist.sum == exp.length.toLong)
    val expHist = new Array[Long](16)
    exp.foreach(v => expHist(v / 16) += 1)
    assert(f.luma_hist.toSeq == expHist.toSeq)
  }

  test("dHash through the real codec matches the sampling rule; corrupt bytes → null") {
    val assets = Seq(
      MediaAsset(1L, "image", pngBytes, meta),
      MediaAsset(2L, "image", Array[Byte](1, 2, 3, 4), meta) // not an image
    ).toDS()
    val rows = dHash(assets, ImageIoCodec).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(2L).isEmpty, "undecodable bytes must fingerprint as null, not fail")
    // independent reimplementation of the 61-sample difference hash
    val exp = expectedLuma
    val n = exp.length
    val s = (0 to 60).map(i => exp(((i.toLong * (n - 1)) / 60).toInt))
    var h = 0L
    (0 until 60).foreach(i => if (s(i + 1) > s(i)) h |= (1L << i))
    assert(rows(1L).contains(h))
  }

  test("resizeAssets re-encodes at the target size (real decode round-trip)") {
    val assets = Seq(MediaAsset(1L, "image", pngBytes, meta)).toDS()
    val resized = resizeAssets(assets, 8, 6, ImageIoCodec).collect().head
    assert(resized.meta.width == 8 && resized.meta.height == 6)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.content))
    assert(back.getWidth == 8 && back.getHeight == 6)
    // and the re-encoded PNG decodes through the SAME codec seam
    val luma2 = ImageIoCodec.decodeLuma(resized.content,
      MediaMeta(8, 6, 0L, "png"))
    assert(luma2.length == 48)
  }
}
