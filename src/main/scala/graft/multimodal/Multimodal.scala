package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image /
  * audio / video as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample as partition-wise
  * batched transforms (the Scala analog of PySpark's `mapInPandas`:
  * `Dataset.mapPartitions` over an iterator, with explicit micro-
  * batching so a real decoder could amortize model/codec init per
  * batch instead of per row).
  *
  * DECODERS ARE STUBBED: this container has no image/audio libs, so
  * [[StubCodec]] derives deterministic fake pixels/samples from the
  * bytes themselves. The Spark-side contract — schema, encoders,
  * batching, partitioning, row explosion — is real and tested; swap
  * [[Codec]] for an FFI-backed implementation to go live.
  *
  * Scale: content bytes never shuffle unless the operator needs them
  * to — features project away the payload as early as possible, and
  * frame sampling explodes AFTER per-partition decode so the shuffle
  * carries frames, not videos.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, durationMs: Long,
                             codec: String)
  final case class MediaAsset(asset_id: Long, media_type: String,
                              content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(asset_id: Long, media_type: String,
                                 n_bytes: Long, luma_mean: Double,
                                 luma_hist: Array[Long])
  final case class Frame(asset_id: Long, frame_idx: Int, ts_ms: Long,
                         frame_bytes: Array[Byte])

  /** Decoder contract a real implementation would satisfy. */
  trait Codec extends Serializable {
    /** Decode to an 8-bit luma plane (stubbed). */
    def decodeLuma(content: Array[Byte], meta: MediaMeta): Array[Int]
    /** Re-encode at a new size (stubbed). */
    def resize(content: Array[Byte], meta: MediaMeta, w: Int, h: Int): Array[Byte]
  }

  /** Deterministic fake: "pixels" are a rolling transform of the
    * content bytes — stable across runs/JVMs, so tests can assert
    * exact values. A real codec would call libjpeg/ffmpeg here.
    */
  object StubCodec extends Codec {
    def decodeLuma(content: Array[Byte], meta: MediaMeta): Array[Int] = {
      var acc = 17
      content.map { b =>
        acc = (acc * 31 + (b & 0xff)) & 0xff
        acc
      }
    }
    def resize(content: Array[Byte], meta: MediaMeta, w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, content.length * (w.toLong * h) /
        math.max(1L, meta.width.toLong * meta.height)).toInt
      java.util.Arrays.copyOf(content, target)
    }
  }

  /** Real image decoder over the JDK's ImageIO — PNG / BMP / GIF /
    * JPEG with zero native dependencies. Opt-in: [[StubCodec]] stays
    * the default/oracle mode (the sf testdata payloads are not real
    * images), but a user with actual image bytes passes this codec and
    * every operator below ([[extractFeatures]], [[dHash]],
    * [[mediaNearDupPairs]], [[resizeAssets]], …) works unchanged.
    *
    * `decodeLuma` returns the integer BT.601 luma per pixel, row-major
    * ((299·R + 587·G + 114·B) / 1000 — integer arithmetic, so the
    * plane is bit-stable across JVMs). Undecodable bytes yield an
    * EMPTY plane, which downstream treats as "no fingerprint" (null
    * dHash, zero-sample features) rather than a task failure — at
    * corpus scale a corrupt image must never kill the job.
    *
    * `resize` re-encodes as PNG (lossless, always writable) at the
    * target size with bilinear interpolation. ImageIO reader/writer
    * instances are NOT shared across threads — ImageIO.read/write
    * create per-call instances, so partition-parallel decode is safe.
    */
  object ImageIoCodec extends Codec {
    def decodeLuma(content: Array[Byte], meta: MediaMeta): Array[Int] = {
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      catch { case _: java.io.IOException => null }
      if (img == null) Array.empty
      else {
        val w = img.getWidth
        val h = img.getHeight
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        rgb.map { p =>
          val r = (p >> 16) & 0xff
          val g = (p >> 8) & 0xff
          val b = p & 0xff
          (299 * r + 587 * g + 114 * b) / 1000
        }
      }
    }
    def resize(content: Array[Byte], meta: MediaMeta,
               w: Int, h: Int): Array[Byte] = {
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      catch { case _: java.io.IOException => null }
      if (img == null) Array.empty
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, w, h, null)
        } finally g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** Real audio decoder over `javax.sound.sampled` — WAV/AIFF
    * containers with 8- or 16-bit integer PCM, zero native deps
    * (the ffmpeg FFI contract stays documented for compressed codecs;
    * see README). Mirrors [[ImageIoCodec]]: opt-in behind the same
    * [[Codec]] seam, [[StubCodec]] remains the default/oracle mode, and
    * every operator below works unchanged — for audio the "luma plane"
    * is the channel-averaged amplitude envelope quantized to 0..255,
    * so [[extractFeatures]] yields amplitude mean/histogram,
    * [[dHash]] an audio fingerprint, [[sceneChanges]] loudness-jump
    * segmentation.
    *
    * The PCM frames are decoded MANUALLY (sample size / endianness /
    * channel mixdown) rather than via `AudioSystem.getAudioInputStream
    * (targetFormat, …)`: the JDK's installed converter set varies by
    * runtime, and a decode that silently depends on it would not be
    * bit-stable across JVMs. Integer arithmetic throughout:
    * 8-bit → value as unsigned; 16-bit → (s + 32768) >> 8; channels
    * average with floor division. Undecodable/compressed/corrupt bytes
    * yield an EMPTY plane (no fingerprint, zero-sample features), never
    * a task failure.
    *
    * `resize(w, h)` reinterprets the image contract as "resample to
    * w·h samples": nearest-neighbor over the decoded envelope,
    * re-encoded as an 8-bit unsigned mono PCM WAV at the source rate —
    * the bandwidth-reduction lever a media pipeline wants from resize.
    */
  object WavCodec extends Codec {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    private def decode(content: Array[Byte]): (Array[Int], Float) = {
      val in = try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => null
      }
      if (in == null) (Array.empty, 0f)
      else try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ok = (enc == AudioFormat.Encoding.PCM_SIGNED ||
          enc == AudioFormat.Encoding.PCM_UNSIGNED) &&
          (bits == 8 || bits == 16) &&
          // a frame must hold channels × bytesPerSample bytes, or the
          // decode loop would index past the buffer — the stock JDK
          // readers always satisfy this, but the "corrupt bytes yield
          // an empty plane, never a task failure" contract shouldn't
          // depend on which SPI parsed the header
          fmt.getFrameSize >= fmt.getChannels * (bits / 8)
        if (!ok) (Array.empty, 0f)
        else {
          val bytes = in.readAllBytes()
          val ch = fmt.getChannels
          val frameSize = fmt.getFrameSize
          val big = fmt.isBigEndian
          val signed = enc == AudioFormat.Encoding.PCM_SIGNED
          val perSample = bits / 8
          val n = bytes.length / frameSize
          val out = new Array[Int](n)
          var f = 0
          while (f < n) {
            var sum = 0
            var c = 0
            while (c < ch) {
              val o = f * frameSize + c * perSample
              val v =
                if (bits == 8) {
                  val raw = bytes(o) & 0xff
                  if (signed) ((bytes(o).toInt) + 128) else raw
                } else {
                  val (b0, b1) = if (big) (bytes(o), bytes(o + 1))
                                 else (bytes(o + 1), bytes(o))
                  val s = (b0 << 8) | (b1 & 0xff) // b0 carries sign
                  val u = if (signed) s + 32768 else ((s & 0xffff) )
                  u >> 8
                }
              sum += v
              c += 1
            }
            out(f) = sum / ch
            f += 1
          }
          (out, fmt.getSampleRate)
        }
      } finally in.close()
    }

    def decodeLuma(content: Array[Byte], meta: MediaMeta): Array[Int] =
      decode(content)._1

    def resize(content: Array[Byte], meta: MediaMeta,
               w: Int, h: Int): Array[Byte] = {
      val (plane, rate) = decode(content)
      if (plane.isEmpty) Array.empty
      else {
        val target = math.max(1, w * h)
        val resampled = new Array[Byte](target)
        var i = 0
        while (i < target) {
          resampled(i) =
            plane((i.toLong * (plane.length - 1) /
              math.max(1, target - 1)).toInt).toByte
          i += 1
        }
        val outFmt = new AudioFormat(
          AudioFormat.Encoding.PCM_UNSIGNED,
          if (rate > 0) rate else 8000f, 8, 1, 1,
          if (rate > 0) rate else 8000f, false)
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(resampled), outFmt, target.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
    }
  }

  /** Real video decoder over a pure-JVM RIFF/AVI container parser —
    * the last stubbed modality made real, zero native deps (the ffmpeg
    * FFI contract stays documented for inter-frame codecs; see
    * README). Two frame encodings, covering the classic "video as a
    * bag of independent pictures" formats:
    *
    *   - raw 24-bit DIB (`00db` chunks, `BI_RGB` in `strf`): decoded
    *     MANUALLY — bottom-up row order, BGR byte order, 4-byte row
    *     stride — in integer arithmetic, bit-stable across JVMs;
    *   - MJPEG (`00dc` chunks / `MJPG` compression): each frame is a
    *     standalone JPEG, decoded through the same ImageIO path as
    *     [[ImageIoCodec]].
    *
    * Mirrors [[WavCodec]]'s seam semantics: for video the "luma plane"
    * is the TEMPORAL LUMA ENVELOPE — one integer per frame, the
    * pixel-averaged BT.601 luma (floor division, 0..255) — so
    * [[extractFeatures]] yields brightness mean/histogram over time,
    * [[dHash]] a temporal fingerprint, [[sceneChanges]] real
    * brightness-jump segmentation, all unchanged. (Per-frame PIXEL
    * planes are exposed via [[decodeFramePlanes]] for callers that
    * want spatial work per frame.) [[StubCodec]] remains the
    * default/oracle mode. Corrupt containers yield an EMPTY envelope;
    * an individually undecodable frame is skipped — never a task
    * failure.
    *
    * `resize(w, h)` decodes every frame, bilinear-resizes it, and
    * re-encodes a raw-DIB AVI (lossless, always writable — the PNG
    * choice of [[ImageIoCodec.resize]] applied to the container), so a
    * resize round-trips through the same seam exactly.
    */
  object AviCodec extends Codec {

    private val MJPG = 0x47504A4DL // 'MJPG' little-endian

    private def le32(b: Array[Byte], o: Int): Long =
      if (o < 0 || o + 4 > b.length) -1L
      else (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    private def le16(b: Array[Byte], o: Int): Int =
      if (o < 0 || o + 2 > b.length) -1
      else (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    private def cc(b: Array[Byte], o: Int): String =
      if (o < 0 || o + 4 > b.length) ""
      else new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    private final case class VidFmt(w: Int, h: Int, bitCount: Int,
                                    compression: Long)

    /** Walk the chunks of `[from, until)`, invoking `f(fourcc,
      * dataOffset, dataSize)`; malformed sizes terminate the walk
      * rather than throw.
      */
    private def walk(b: Array[Byte], from: Int, until: Int)
                    (f: (String, Int, Int) => Unit): Unit = {
      var o = from
      while (o + 8 <= until) {
        val id = cc(b, o)
        val sz = le32(b, o + 4)
        if (sz < 0 || o + 8 + sz > until) return
        f(id, o + 8, sz.toInt)
        o += 8 + sz.toInt + (sz.toInt & 1)
      }
    }

    /** Parse container → (vids stream format, frame payload slices).
      * None when the bytes are not a well-formed AVI with one video
      * stream.
      */
    private def parse(content: Array[Byte]): Option[(VidFmt, Vector[(Int, Int)])] = {
      if (content.length < 12 || cc(content, 0) != "RIFF" ||
        cc(content, 8) != "AVI ") return None
      val riffEnd = math.min(content.length.toLong, 8L + le32(content, 4)).toInt
      var fmt: Option[VidFmt] = None
      // stream ordinal of the matched vids stream: movi chunk ids are
      // prefixed with it ("00dc"…), so in a multi-stream AVI (e.g.
      // vids+auds) only this stream's frames may be decoded with the
      // captured geometry
      var strlIdx = -1
      var vidsIdx = -1
      val frames = Vector.newBuilder[(Int, Int)]
      def inStrl(from: Int, until: Int): Unit = {
        strlIdx += 1
        var isVids = false
        walk(content, from, until) { (id, o, sz) =>
          if (id == "strh" && sz >= 8) isVids = cc(content, o) == "vids"
          else if (id == "strf" && sz >= 40 && isVids && fmt.isEmpty) {
            vidsIdx = strlIdx
            fmt = Some(VidFmt(le32(content, o + 4).toInt,
              le32(content, o + 8).toInt, le16(content, o + 14),
              le32(content, o + 16)))
          }
        }
      }
      def inList(listType: String, from: Int, until: Int): Unit =
        listType match {
          case "hdrl" | "rec " | "movi" =>
            walk(content, from, until) { (id, o, sz) =>
              if (id == "LIST" && sz >= 4)
                cc(content, o) match {
                  case "strl" if listType == "hdrl" => inStrl(o + 4, o + sz)
                  case t => inList(t, o + 4, o + sz)
                }
              else if (listType != "hdrl" && sz > 0 && id.length == 4 &&
                id(0).isDigit && id(1).isDigit &&
                (id(0) - '0') * 10 + (id(1) - '0') == vidsIdx &&
                (id.endsWith("db") || id.endsWith("dc")))
                frames += ((o, sz))
            }
          case _ => ()
        }
      walk(content, 12, riffEnd) { (id, o, sz) =>
        if (id == "LIST" && sz >= 4) inList(cc(content, o), o + 4, o + sz)
      }
      fmt.map(f => (f, frames.result()))
    }

    /** Decoded per-frame BT.601 luma planes (row-major); undecodable
      * frames are skipped, undecodable containers yield Nil.
      */
    def decodeFramePlanes(content: Array[Byte]): Vector[Array[Int]] =
      parse(content).fold(Vector.empty[Array[Int]]) { case (fmt, frames) =>
        frames.flatMap { case (o, sz) =>
          decodeFrame(content, o, sz, fmt)
        }
      }

    private def decodeFrame(b: Array[Byte], o: Int, sz: Int,
                            fmt: VidFmt): Option[Array[Int]] = {
      val isJpeg = sz >= 2 && (b(o) & 0xff) == 0xff && (b(o + 1) & 0xff) == 0xd8
      if (fmt.compression == MJPG || isJpeg) {
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b, o, sz))
        catch { case _: java.io.IOException => null }
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val rgb = img.getRGB(0, 0, w, h, null, 0, w)
          Some(rgb.map { p =>
            (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
          })
        }
      } else if (fmt.compression == 0L && fmt.bitCount == 24 &&
        fmt.w > 0 && fmt.h != 0) {
        val w = fmt.w
        val h = math.abs(fmt.h)
        // Long arithmetic: a hostile strf width (w ≈ 8e8) overflows an
        // Int stride*h to negative and slips past the size guard; since
        // sz ≤ content length this bound also caps the allocation.
        val strideL = (w.toLong * 3 + 3) / 4 * 4
        if (strideL * h > sz || w.toLong * h > Int.MaxValue) None
        else {
          val stride = strideL.toInt
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            // positive biHeight = bottom-up storage
            val srcRow = if (fmt.h > 0) h - 1 - y else y
            var x = 0
            while (x < w) {
              val p = o + srcRow * stride + x * 3
              val blue = b(p) & 0xff
              val green = b(p + 1) & 0xff
              val red = b(p + 2) & 0xff
              out(y * w + x) = (299 * red + 587 * green + 114 * blue) / 1000
              x += 1
            }
            y += 1
          }
          Some(out)
        }
      } else None
    }

    def decodeLuma(content: Array[Byte], meta: MediaMeta): Array[Int] =
      decodeFramePlanes(content).collect {
        case p if p.nonEmpty => (p.map(_.toLong).sum / p.length).toInt
      }.toArray

    private def leBytes(out: java.io.ByteArrayOutputStream, v: Long,
                        n: Int): Unit = {
      var i = 0
      while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }

    private def chunk(out: java.io.ByteArrayOutputStream, id: String,
                      data: Array[Byte]): Unit = {
      out.write(id.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      leBytes(out, data.length.toLong, 4)
      out.write(data, 0, data.length)
      if (data.length % 2 == 1) out.write(0)
    }

    /** Minimal standards-shaped AVI writer (RIFF/hdrl/strl/movi) used
      * by [[resize]] and the spec's MJPEG wrapping; frames are written
      * verbatim as `00db`/`00dc` chunks.
      */
    private[multimodal] def writeAvi(frames: Seq[Array[Byte]], w: Int,
                                     h: Int, mjpeg: Boolean): Array[Byte] = {
      val stride = (w * 3 + 3) / 4 * 4
      def bytesOf(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream(); f(b); b.toByteArray
      }
      val avih = bytesOf { b =>
        Seq(40000L, 0L, 0L, 0L, frames.length.toLong, 0L, 1L, 0L,
          w.toLong, h.toLong, 0L, 0L, 0L, 0L).foreach(leBytes(b, _, 4))
      }
      val strh = bytesOf { b =>
        b.write("vids".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        b.write((if (mjpeg) "MJPG" else "DIB ")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        leBytes(b, 0L, 4); leBytes(b, 0L, 2); leBytes(b, 0L, 2)
        Seq(0L, 1L, 25L, 0L, frames.length.toLong, 0L, 0L, 0L)
          .foreach(leBytes(b, _, 4))
        Seq(0L, 0L, w.toLong, h.toLong).foreach(leBytes(b, _, 2))
      }
      val strf = bytesOf { b =>
        Seq(40L, w.toLong, h.toLong).foreach(leBytes(b, _, 4))
        leBytes(b, 1L, 2); leBytes(b, 24L, 2)
        Seq(if (mjpeg) MJPG else 0L, (stride * h).toLong, 0L, 0L, 0L, 0L)
          .foreach(leBytes(b, _, 4))
      }
      val strl = bytesOf { b =>
        b.write("strl".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        chunk(b, "strh", strh); chunk(b, "strf", strf)
      }
      val hdrl = bytesOf { b =>
        b.write("hdrl".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        chunk(b, "avih", avih); chunk(b, "LIST", strl)
      }
      val movi = bytesOf { b =>
        b.write("movi".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        frames.foreach(chunk(b, if (mjpeg) "00dc" else "00db", _))
      }
      val body = bytesOf { b =>
        b.write("AVI ".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        chunk(b, "LIST", hdrl); chunk(b, "LIST", movi)
      }
      bytesOf { b =>
        b.write("RIFF".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        leBytes(b, body.length.toLong, 4)
        b.write(body, 0, body.length)
      }
    }

    private def frameToImage(b: Array[Byte], o: Int, sz: Int,
                             fmt: VidFmt): Option[java.awt.image.BufferedImage] = {
      val isJpeg = sz >= 2 && (b(o) & 0xff) == 0xff && (b(o + 1) & 0xff) == 0xd8
      if (fmt.compression == MJPG || isJpeg) {
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b, o, sz))
        catch { case _: java.io.IOException => null }
        Option(img)
      } else if (fmt.compression == 0L && fmt.bitCount == 24 &&
        fmt.w > 0 && fmt.h != 0) {
        val w = fmt.w
        val h = math.abs(fmt.h)
        // same Long-arithmetic overflow guard as decodeFrame
        val strideL = (w.toLong * 3 + 3) / 4 * 4
        if (strideL * h > sz || w.toLong * h > Int.MaxValue) None
        else {
          val stride = strideL.toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val srcRow = if (fmt.h > 0) h - 1 - y else y
            var x = 0
            while (x < w) {
              val p = o + srcRow * stride + x * 3
              img.setRGB(x, y, ((b(p + 2) & 0xff) << 16) |
                ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff))
              x += 1
            }
            y += 1
          }
          Some(img)
        }
      } else None
    }

    private def imageToDib(img: java.awt.image.BufferedImage, w: Int,
                           h: Int): Array[Byte] = {
      val stride = (w * 3 + 3) / 4 * 4
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val o = (h - 1 - y) * stride + x * 3 // bottom-up
          out(o) = (p & 0xff).toByte
          out(o + 1) = ((p >> 8) & 0xff).toByte
          out(o + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    def resize(content: Array[Byte], meta: MediaMeta,
               w: Int, h: Int): Array[Byte] =
      parse(content).fold(Array.empty[Byte]) { case (fmt, frames) =>
        val resized = frames.flatMap { case (o, sz) =>
          frameToImage(content, o, sz, fmt).map { img =>
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = out.createGraphics()
            try {
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, w, h, null)
            } finally g2.dispose()
            imageToDib(out, w, h)
          }
        }
        if (resized.isEmpty) Array.empty
        else writeAvi(resized, w, h, mjpeg = false)
      }
  }

  /** Batched feature extraction (luma mean + 16-bin histogram):
    * partition-wise with `batchSize` assets decoded per inner batch —
    * the mapInPandas batch shape. No shuffle; the binary payload is
    * dropped from the output row.
    */
  def extractFeatures(assets: Dataset[MediaAsset], codec: Codec = StubCodec,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init point (model/codec handles in a real impl)
        batch.iterator.map { a =>
          val luma = codec.decodeLuma(a.content, a.meta)
          val hist = new Array[Long](16)
          var sum = 0L
          luma.foreach { v => hist(v / 16) += 1; sum += v }
          val mean = if (luma.isEmpty) 0.0 else sum.toDouble / luma.length
          MediaFeatures(a.asset_id, a.media_type, a.content.length.toLong,
            mean, hist)
        }
      }
    }
  }

  /** Resize: new payload + updated metadata, partition-wise. */
  def resizeAssets(assets: Dataset[MediaAsset], w: Int, h: Int,
                   codec: Codec = StubCodec): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      a.copy(content = codec.resize(a.content, a.meta, w, h),
        meta = a.meta.copy(width = w, height = h))
    }
  }

  /** Frame sampling: every `everyMs` over the asset duration, emitted
    * as one row per frame (decode once per asset, explode after).
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long,
                   codec: Codec = StubCodec): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val n = math.max(0L, a.meta.durationMs / everyMs).toInt
      val luma = codec.decodeLuma(a.content, a.meta)
      (0 until n).map { i =>
        val ts = i.toLong * everyMs
        // stub frame payload: a slice of the decoded plane
        val off = if (luma.isEmpty) 0 else (ts % math.max(1, luma.length)).toInt
        val len = math.min(16, math.max(0, luma.length - off))
        Frame(a.asset_id, i, ts, luma.slice(off, off + len).map(_.toByte))
      }
    }
  }

  /** File-system media ingest: Spark's `binaryFile` source reads a
    * directory of opaque media files as (path, modificationTime,
    * length, content) rows — the 100 TB ingest edge for image/audio
    * corpora (one task per file group, content never materialized on
    * the driver). `pathGlobFilter` prunes by extension BEFORE read.
    * Asset ids are the md5-prefix hash of the file name: stable across
    * re-ingests, independent of listing order.
    */
  def ingestFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
                  glob: String, mediaType: String): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        graft.functions.Portable.hash32(
          element_at(split(col("path"), "/"), -1)).as("asset_id"),
        lit(mediaType).as("media_type"),
        col("content"),
        struct(lit(64).as("width"), lit(64).as("height"),
          (col("length") * 10L).as("durationMs"),
          lit("stub").as("codec")).as("meta"))
      .as[MediaAsset]
  }

  /** Wrap any binary-ish column as typed media assets (harness helper:
    * the testdata has no real media, so callers cast e.g. document
    * text to binary payloads).
    */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String,
               mediaType: String): Dataset[MediaAsset] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("asset_id"),
        lit(mediaType).as("media_type"),
        col(payloadCol).cast("binary").as("content"),
        struct(lit(64).as("width"), lit(64).as("height"),
          // octet_length, not length: duration must track the BYTE
          // payload the codec sees, not the character count
          (octet_length(col(payloadCol)) * 10L).cast("long").as("durationMs"),
          lit("stub").as("codec")).as("meta"))
      .as[MediaAsset]
  }

  /** Scene-change detection over sampled frames: a frame starts a new
    * scene when its luma mass jumps by more than `threshold` vs the
    * previous frame (plus frame 0, always a boundary). The frame
    * statistic is an INTEGER sum of the frame's luma samples — exact,
    * order-free, engine-portable — so the boundary set oracles
    * bit-for-bit where a float mean-diff would not. One window per
    * asset (shuffle keyed on asset id; frames of one asset are
    * ~duration/everyMs rows, never the corpus).
    */
  def sceneChanges(assets: Dataset[MediaAsset], everyMs: Long = 500L,
                   threshold: Long = 200L,
                   codec: Codec = StubCodec): DataFrame = {
    import assets.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val fs = sampleFrames(assets, everyMs, codec)
      .map(f => (f.asset_id, f.frame_idx, f.ts_ms,
        f.frame_bytes.map(b => (b & 0xff).toLong).sum))
      .toDF("asset_id", "frame_idx", "ts_ms", "fsum")
    val w = Window.partitionBy("asset_id").orderBy("frame_idx")
    fs.withColumn("__prev", lag("fsum", 1).over(w))
      .filter(col("__prev").isNull ||
        abs(col("fsum") - col("__prev")) > threshold)
      .select("asset_id", "frame_idx", "ts_ms", "fsum")
  }

  /** Perceptual dHash over the decoded luma plane: `bits`+1
    * evenly-spaced samples, bit i = sample(i+1) > sample(i), packed to
    * a long. The classic difference-hash image fingerprint — robust to
    * uniform brightness/scale shifts (only ORDER between neighbors
    * matters), and ≤8 bytes per asset at any payload size. Decode is
    * per-row in mapPartitions (the real-codec batch shape); empty
    * payloads yield null (no fingerprint, never pairs). bits ≤ 60,
    * never 64: every band/shift/sum stays in non-negative long range
    * on ANY engine — bit 63 would make the packed value sign-sensitive
    * under >> and SUM.
    */
  def dHash(assets: Dataset[MediaAsset], codec: Codec = StubCodec,
            bits: Int = 60): DataFrame = {
    require(bits > 0 && bits <= 60, s"dHash bits must be in 1..60, got $bits")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val luma = codec.decodeLuma(a.content, a.meta)
        if (luma.isEmpty) (a.asset_id, None: Option[Long])
        else {
          val n = luma.length
          val s = (0 to bits).map(i =>
            luma(((i.toLong * (n - 1)) / bits).toInt))
          var h = 0L
          var i = 0
          while (i < bits) {
            if (s(i + 1) > s(i)) h |= (1L << i)
            i += 1
          }
          (a.asset_id, Some(h))
        }
      }
    }.toDF("asset_id", "dhash")
  }

  /** Media near-dup pairs by banded dHash matching: 4 equal-width
    * bands propose candidates (pigeonhole-EXACT for hamming < 4 — a
    * pair differing in ≤3 bits must agree on one full band), exact
    * hamming via bit_count(xor) verifies. Same scale shape as text
    * SimHash: the shuffle carries 4 band keys per asset, never
    * payloads, never asset × asset.
    *
    * Default 60-bit hash → 15-bit bands (32768 values each). Band
    * VALUE SPACE is the corpus-scale lever: with the old 8-bit bands
    * (256 values) every bucket holds ~corpus/256 assets and the
    * candidate self-join goes quadratic once the corpus dwarfs the key
    * space — the sf1 bench leg measured exactly that wall (≈39M
    * candidate pairs at 50k assets, 18 s). 15-bit bands keep bucket
    * occupancy ~corpus/32k, restoring ~linear candidate volume well
    * past millions of assets; beyond that, widen the hash to two longs
    * before shrinking bands below hamming-exactness.
    */
  def mediaNearDupPairs(assets: Dataset[MediaAsset], maxDist: Int = 3,
                        codec: Codec = StubCodec,
                        bits: Int = 60): DataFrame = {
    require(maxDist < 4, "4-band blocking is only exact for hamming < 4")
    require(bits % 4 == 0, s"bits must split into 4 equal bands, got $bits")
    val bandWidth = bits / 4
    val mask = (1L << bandWidth) - 1L
    val dh = dHash(assets, codec, bits).filter(col("dhash").isNotNull)
      .localCheckpoint()
    val keyed = dh.select(col("asset_id"),
      explode(array((0 until 4).map(b =>
        concat_ws("_", lit(b),
          shiftright(col("dhash"), bandWidth * b).bitwiseAND(lit(mask)))): _*))
        .as("bk"))
    val cand = keyed.withColumnRenamed("asset_id", "id_a")
      .join(keyed.withColumnRenamed("asset_id", "id_b"), "bk")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(dh.select(col("asset_id").as("id_a"), col("dhash").as("__ha")),
        "id_a")
      .join(dh.select(col("asset_id").as("id_b"), col("dhash").as("__hb")),
        "id_b")
      .withColumn("hamming",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
