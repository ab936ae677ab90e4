package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract run as batch functions over `mapPartitions`.
  *
  * Codec layer (r10 revision): image PIXELS and WAV PCM SAMPLES decode
  * FOR REAL — the JDK ships full PNG/JPEG/GIF/BMP decoders
  * (`ImageIO.read`, [[PixelDecoder]]) and integer PCM needs no codec
  * at all ([[WavPcm]]) — so luminance-grid features, real thumbnails
  * (`resizeImages`), per-window loudness (`segmentLoudness`), and
  * content embeddings (`embedMedia`) are actual content math.
  * Video/audio CONTAINER headers parse via [[ContainerProbe]] (MP4
  * box walk, EBML/WebM element walk, WAV RIFF chunks → dimensions +
  * duration). The one genuinely codec-blocked surface on this box is
  * COMPRESSED AV content (MP4/WebM frames, MP3/AAC samples), which
  * keeps [[StubDecoder]]'s deterministic stand-ins; payloads with no
  * parseable header fall back to it entirely. Everything Spark-side
  * is real — schema, partition sizing, batch iteration shape — so a
  * full AV codec drops into the same slots.
  *
  * Scale notes: media rows are orders of magnitude wider than text —
  * partition budgets must be set by BYTES not rows
  * (`spark.sql.files.maxPartitionBytes`, and `repartitionByRange` on a
  * size column before heavy decode stages so one task never holds
  * multiple 4K videos).
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,           // image | audio | video
      bytes: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha256: String,
      width: Int,             // fake-decoded dimensions / duration
      height: Int,
      duration_ms: Long,
      feature: Array[Float])  // fixed-width embedding-shaped vector

  /** REAL image header decode via `javax.imageio` (JDK-built-in, no
    * external deps): width/height come from the actual PNG/JPEG/GIF/BMP
    * headers — `ImageReader.getWidth/getHeight(0)` parses headers only,
    * never the pixel payload, so this is a metadata-cheap scan stage.
    * Returns None for payloads no registered reader accepts (then the
    * caller falls back to [[StubDecoder]], which is still the honest
    * stand-in for audio/video — the container ships no AV codecs).
    */
  object ImageHeaderDecoder {
    // In-memory streams only: ImageIO's default is a temp-FILE-backed
    // cache per createImageInputStream call, which turns every probe
    // into disk I/O — measured ~5x on the decode gate query.
    javax.imageio.ImageIO.setUseCache(false)

    /** Magic-byte sniff (PNG/JPEG/GIF/BMP) so non-image payloads skip
      * ImageIO entirely — the registry scan + stream setup per row is
      * ~10x the cost of this four-byte check, and at media-corpus scale
      * most rows of a mixed table are NOT decodable images.
      */
    def looksLikeImage(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 &&
        (((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
         ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) ||
         (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
         (b(0) == 'B' && b(1) == 'M'))

    def dimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (!looksLikeImage(bytes)) return None
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (in == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            Some((r.getWidth(0), r.getHeight(0)))
          } catch {
            case _: java.io.IOException => None // truncated/corrupt header
          } finally r.dispose()
        }
      } finally in.close()
    }

    /** Full decode contract: real header metadata whenever the payload
      * carries a parseable header — image dimensions via `javax.imageio`,
      * video/audio dimensions+duration via [[ContainerProbe]]
      * (MP4/EBML/WAV) — PLUS real CONTENT features where a codec-free
      * decode exists (r10): decodable images carry a 4×2 area-averaged
      * luminance grid ([[PixelDecoder.lumaGrid]]) as their 8-float
      * feature, WAV-PCM audio carries an 8-bin RMS loudness grid
      * ([[WavPcm.rmsGrid]]). [[StubDecoder]] values fill everything
      * else (compressed AV content — the one genuinely codec-blocked
      * surface).
      */
    def decode(row: MediaRow): MediaFeatures = {
      val stub = StubDecoder.decode(row)
      row.kind match {
        case "image" =>
          PixelDecoder.image(row.bytes) match {
            case Some(img) => stub.copy(
              width = img.getWidth, height = img.getHeight,
              feature = PixelDecoder.lumaGrid(img, 4, 2))
            case None =>
              dimensions(row.bytes) match {
                case Some((w, h)) => stub.copy(width = w, height = h)
                case None => stub
              }
          }
        case "video" | "audio" =>
          val withHeader = ContainerProbe.probe(row.bytes) match {
            case Some(p) => stub.copy(
              width = p.width.getOrElse(stub.width),
              height = p.height.getOrElse(stub.height),
              duration_ms = p.durationMs.getOrElse(stub.duration_ms))
            case None => stub
          }
          if (row.kind == "audio")
            WavPcm.decode(row.bytes) match {
              case Some(pcm) =>
                withHeader.copy(feature = WavPcm.rmsGrid(pcm, 8))
              case None => withHeader
            }
          else withHeader
        case _ => stub
      }
    }
  }

  /** REAL pixel decode — the r9 "sandbox has no codec libs" constraint
    * is true only for COMPRESSED AUDIO/VIDEO: the JDK itself ships
    * full pixel decoders for PNG/JPEG/GIF/BMP (`ImageIO.read`), so
    * image payload CONTENT decodes for real with zero external deps.
    * Everything derived here is hand-rolled integer-area arithmetic
    * (no Graphics2D filtering, whose interpolation is
    * platform-variant): deterministic across JVMs and runs.
    */
  object PixelDecoder {
    import java.awt.image.BufferedImage

    /** Full pixel decode (sniffed first — see
      * [[ImageHeaderDecoder.looksLikeImage]]); None for payloads no
      * JDK reader accepts, and never throws (scan-stage contract).
      */
    def image(b: Array[Byte]): Option[BufferedImage] =
      if (!ImageHeaderDecoder.looksLikeImage(b)) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
        catch { case _: Throwable => None }

    private def lumaAt(img: BufferedImage, x: Int, y: Int): Double = {
      val rgb = img.getRGB(x, y)
      (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)) / 255.0
    }

    /** `gw × gh` area-averaged luminance grid in [0, 1], row-major —
      * the REAL resolution-independent content feature (cell (cx, cy)
      * covers pixel box `[cx·w/gw, (cx+1)·w/gw) × [cy·h/gh,
      * (cy+1)·h/gh)`, integer boundaries, every pixel in exactly one
      * cell). Deterministic: pure integer loops + one double sum per
      * cell in raster order.
      */
    def lumaGrid(img: BufferedImage, gw: Int, gh: Int): Array[Float] = {
      require(gw > 0 && gh > 0, s"grid must be positive: ${gw}x$gh")
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Float](gw * gh)
      var cy = 0
      while (cy < gh) {
        var cx = 0
        while (cx < gw) {
          val x0 = cx.toLong * w / gw; val x1 = (cx + 1).toLong * w / gw
          val y0 = cy.toLong * h / gh; val y1 = (cy + 1).toLong * h / gh
          var sum = 0.0
          var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += lumaAt(img, x.toInt, y.toInt); n += 1; x += 1
            }
            y += 1
          }
          out(cy * gw + cx) = if (n == 0) 0f else (sum / n).toFloat
          cx += 1
        }
        cy += 1
      }
      out
    }

    /** Aspect-preserving REAL thumbnail into `maxW × maxH` (never
      * upscales): per-channel integer-area averaging — each target
      * pixel is the mean of its exact source box. Returns
      * `(w, h, rgb)` with `rgb` packed row-major 3 bytes/pixel.
      */
    def resize(img: BufferedImage, maxW: Int, maxH: Int): (Int, Int, Array[Byte]) = {
      require(maxW > 0 && maxH > 0, s"target box must be positive: ${maxW}x$maxH")
      val w = img.getWidth
      val h = img.getHeight
      val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
      val tw = math.max(1, (w * scale).toInt)
      val th = math.max(1, (h * scale).toInt)
      val out = new Array[Byte](tw * th * 3)
      var ty = 0
      while (ty < th) {
        var tx = 0
        while (tx < tw) {
          val x0 = tx.toLong * w / tw; val x1 = math.max(x0 + 1, (tx + 1).toLong * w / tw)
          val y0 = ty.toLong * h / th; val y1 = math.max(y0 + 1, (ty + 1).toLong * h / th)
          var r = 0L; var g = 0L; var b = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x.toInt, y.toInt)
              r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
              n += 1; x += 1
            }
            y += 1
          }
          val o = (ty * tw + tx) * 3
          out(o) = (r / n).toByte; out(o + 1) = (g / n).toByte; out(o + 2) = (b / n).toByte
          tx += 1
        }
        ty += 1
      }
      (tw, th, out)
    }
  }

  /** REAL PCM decode for WAV payloads — uncompressed PCM needs no
    * codec, just the RIFF walk [[ContainerProbe.wav]] already does
    * plus the sample read: format 1 (integer PCM) at 8 or 16 bits,
    * any channel count (mixed down to mono by plain averaging).
    * Bounds-checked; None rather than throw on anything else
    * (compressed WAV variants stay honestly undecoded).
    */
  object WavPcm {
    final case class Pcm(sampleRate: Int, channels: Int,
        bitsPerSample: Int, mono: Array[Float]) {
      def durationMs: Long =
        if (sampleRate == 0) 0L else mono.length.toLong * 1000 / sampleRate
    }

    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    def decode(b: Array[Byte]): Option[Pcm] = {
      if (!ContainerProbe.looksLikeWav(b)) return None
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
      var data: Option[(Int, Int)] = None          // (offset, length)
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "ISO-8859-1")
        val sz = le32(b, off + 4)
        if (sz < 0 || off + 8 + sz > b.length) return fmtData(fmt, data, b)
        if (id == "fmt " && sz >= 16)
          fmt = Some((le16(b, off + 8), le16(b, off + 10),
            le32(b, off + 12).toInt, le16(b, off + 22)))
        else if (id == "data")
          data = Some((off + 8, sz.toInt))
        off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
      fmtData(fmt, data, b)
    }

    private def fmtData(fmt: Option[(Int, Int, Int, Int)],
        data: Option[(Int, Int)], b: Array[Byte]): Option[Pcm] =
      (fmt, data) match {
        case (Some((1, ch, rate, bits)), Some((off, len)))
            if ch > 0 && rate > 0 && (bits == 8 || bits == 16) =>
          val bytesPerFrame = ch * bits / 8
          val frames = len / bytesPerFrame
          val mono = new Array[Float](frames)
          var f = 0
          while (f < frames) {
            var sum = 0.0
            var c = 0
            while (c < ch) {
              val o = off + f * bytesPerFrame + c * bits / 8
              sum += (if (bits == 16)
                (le16(b, o).toShort).toDouble / 32768.0
              else ((b(o) & 0xff) - 128).toDouble / 128.0)
              c += 1
            }
            mono(f) = (sum / ch).toFloat
            f += 1
          }
          Some(Pcm(rate, ch, bits, mono))
        case _ => None
      }

    /** Root-mean-square loudness of a sample slice, in [0, 1]. */
    def rms(samples: Array[Float], from: Int, until: Int): Float = {
      val lo = math.max(0, from)
      val hi = math.min(samples.length, until)
      if (hi <= lo) return 0f
      var s = 0.0
      var i = lo
      while (i < hi) { s += samples(i).toDouble * samples(i); i += 1 }
      math.sqrt(s / (hi - lo)).toFloat
    }

    /** `bins` equal-width RMS bins over the whole clip — the audio
      * twin of [[PixelDecoder.lumaGrid]].
      */
    def rmsGrid(p: Pcm, bins: Int): Array[Float] = {
      require(bins > 0, s"bins must be positive: $bins")
      Array.tabulate(bins) { i =>
        rms(p.mono, (i.toLong * p.mono.length / bins).toInt,
          ((i + 1).toLong * p.mono.length / bins).toInt)
      }
    }
  }

  /** REAL video/audio CONTAINER header probes — no external deps, pure
    * byte parsing of the three container families whose headers are
    * self-describing, mirroring the r3 image treatment
    * (`javax.imageio` headers): the container/page metadata is decoded
    * for real; only frame/sample CONTENT stays stubbed (the box ships
    * no AV codecs).
    *
    *  - ISO BMFF / MP4 (`....ftyp`): box walk `moov`→`mvhd` (timescale +
    *    duration) and `moov`→`trak`→`tkhd` (16.16 fixed-point
    *    width/height of the first visually-sized track).
    *  - EBML / Matroska / WebM (`1A 45 DF A3`): element walk
    *    `Segment`→`Info` (TimestampScale × Duration → ms) and
    *    `Segment`→`Tracks`→`TrackEntry`→`Video` (PixelWidth/Height).
    *  - WAV (`RIFF….WAVE`): `fmt ` byte-rate + `data` chunk size → ms.
    *
    * All parsers are bounds-checked against truncated/corrupt headers
    * and return None rather than throw — a scan stage must never die on
    * a hostile payload.
    */
  object ContainerProbe {
    final case class Probe(
        container: String,
        width: Option[Int],
        height: Option[Int],
        durationMs: Option[Long])

    def looksLikeMp4(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 &&
        b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    def looksLikeEbml(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 &&
        (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

    def looksLikeWav(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def probe(b: Array[Byte]): Option[Probe] =
      if (looksLikeMp4(b)) mp4(b)
      else if (looksLikeEbml(b)) ebml(b)
      else if (looksLikeWav(b)) wav(b)
      else None

    private def be32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    private def be64(b: Array[Byte], off: Int): Long =
      (be32(b, off) << 32) | be32(b, off + 4)

    private def le32(b: Array[Byte], off: Int): Long =
      ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
        ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

    // ---- ISO BMFF ----------------------------------------------------
    def mp4(b: Array[Byte]): Option[Probe] = {
      var width, height = Option.empty[Int]
      var durMs = Option.empty[Long]
      def walk(start: Long, end: Long, depth: Int): Unit = {
        if (depth > 8) return // malformed self-nesting guard
        var off = start
        while (off + 8 <= end) {
          var size = be32(b, off.toInt)
          var hdr = 8L
          if (size == 1 && off + 16 <= end) { size = be64(b, off.toInt + 8); hdr = 16 }
          else if (size == 0) size = end - off // last box runs to end
          if (size < hdr || off + size > end) return // corrupt: stop walking
          val typ = new String(b, off.toInt + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
          val body = (off + hdr).toInt
          typ match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              walk(off + hdr, off + size, depth + 1)
            // field reads are bounded by THIS box's declared end, not the
            // parent's: a truncated mvhd/tkhd must yield None, never
            // sibling-box bytes reinterpreted as timescale/duration/dims
            case "mvhd" if durMs.isEmpty && body < off + size =>
              val boxEnd = off + size
              val v = b(body) & 0xff
              if (v == 0 && body + 20 <= boxEnd) {
                val scale = be32(b, body + 12)
                if (scale > 0) durMs = Some(be32(b, body + 16) * 1000L / scale)
              } else if (v == 1 && body + 32 <= boxEnd) {
                val scale = be32(b, body + 20)
                if (scale > 0) durMs = Some(be64(b, body + 24) * 1000L / scale)
              }
            case "tkhd" if width.isEmpty && body < off + size =>
              val boxEnd = off + size
              val v = b(body) & 0xff
              val wOff = if (v == 1) body + 88 else body + 76
              if (wOff + 8 <= boxEnd) {
                val w = (be32(b, wOff) >> 16).toInt     // 16.16 fixed point
                val h = (be32(b, wOff + 4) >> 16).toInt
                if (w > 0 && h > 0) { width = Some(w); height = Some(h) }
              }
            case _ => // leaf box we don't need
          }
          off += size
        }
      }
      try walk(0, b.length.toLong, 0) catch { case _: RuntimeException => }
      if (width.isEmpty && durMs.isEmpty) None
      else Some(Probe("mp4", width, height, durMs))
    }

    // ---- EBML (Matroska / WebM) --------------------------------------
    def ebml(b: Array[Byte]): Option[Probe] = {
      var width, height = Option.empty[Int]
      var tsScaleNs = 1000000L               // Matroska default
      var durTicks = Option.empty[Double]
      // (value, encodedLength); IDs keep the marker bits, sizes clear them
      def vint(off: Int, keepMarker: Boolean): Option[(Long, Int)] = {
        if (off >= b.length) return None
        val first = b(off) & 0xff
        if (first == 0) return None          // >8-byte vint: out of spec here
        val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
        if (off + len > b.length) return None
        var v = (if (keepMarker) first else first & (0xff >>> len)).toLong
        var i = 1
        while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
        Some((v, len))
      }
      def uint(off: Int, n: Int): Long = {
        var v = 0L; var i = 0
        while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
        v
      }
      def float(off: Int, n: Int): Option[Double] = n match {
        case 4 => Some(java.lang.Float.intBitsToFloat(uint(off, 4).toInt).toDouble)
        case 8 => Some(java.lang.Double.longBitsToDouble(uint(off, 8)))
        case _ => None
      }
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 8) return
        var off = start
        while (off < end) {
          val id = vint(off, keepMarker = true) match {
            case Some(x) => x; case None => return
          }
          val sz = vint(off + id._2, keepMarker = false) match {
            case Some(x) => x; case None => return
          }
          val body = off + id._2 + sz._2
          // all-ones size payload = "unknown size" (streamed Segment):
          // runs to the parent's end
          val unknown = sz._1 == (1L << (7 * sz._2)) - 1
          val bodyEnd = if (unknown) end else body + sz._1.toInt
          if (body > end || bodyEnd > end || bodyEnd < body) return
          id._1 match {
            case 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xAEL | 0xE0L =>
              walk(body, bodyEnd, depth + 1)  // Segment/Info/Tracks/TrackEntry/Video
            case 0x2AD7B1L => tsScaleNs = uint(body, (bodyEnd - body).min(8))
            case 0x4489L   => durTicks = float(body, bodyEnd - body)
            case 0xB0L if width.isEmpty  => width = Some(uint(body, (bodyEnd - body).min(8)).toInt)
            case 0xBAL if height.isEmpty => height = Some(uint(body, (bodyEnd - body).min(8)).toInt)
            case _ => // skip
          }
          off = bodyEnd
        }
      }
      try walk(0, b.length, 0) catch { case _: RuntimeException => }
      val durMs = durTicks.map(t => math.round(t * tsScaleNs / 1e6))
      if (width.isEmpty && durMs.isEmpty) None
      else Some(Probe("ebml", width, height, durMs))
    }

    // ---- WAV ---------------------------------------------------------
    def wav(b: Array[Byte]): Option[Probe] = {
      var byteRate = 0L
      var dataBytes = -1L
      var off = 12L
      // declared chunk sizes are trusted for duration math even when the
      // payload is a truncated prefix (headers are routinely probed from
      // the first KB of a stream); reads stay bounds-checked
      while (off + 8 <= b.length && (byteRate == 0 || dataBytes < 0)) {
        val i = off.toInt
        val id = new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        val sz = le32(b, i + 4)
        if (id == "fmt " && sz >= 16 && i + 20 <= b.length) byteRate = le32(b, i + 16)
        else if (id == "data") dataBytes = sz
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      wavResult(byteRate, dataBytes)
    }
    private def wavResult(byteRate: Long, dataBytes: Long): Option[Probe] =
      if (byteRate > 0 && dataBytes >= 0)
        Some(Probe("wav", None, None, Some(dataBytes * 1000L / byteRate)))
      else None
  }

  /** Deterministic fake decode: dimensions/duration/feature derived
    * from a SHA-256 of the payload. The stand-in for codecs the
    * container doesn't ship (audio/video); image rows get REAL header
    * dimensions via [[ImageHeaderDecoder]]. The signature (one batch
    * in, one batch out) is the contract.
    */
  object StubDecoder {
    // one digest per worker thread (getInstance per ROW was the
    // per-record cost), hex via a table instead of String.format per
    // byte — same bytes, same hex
    private val Sha256Local = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("SHA-256")
    }
    private val HexChars = "0123456789abcdef".toCharArray
    private def hexOf(d: Array[Byte]): String = {
      val out = new Array[Char](d.length * 2)
      var i = 0
      while (i < d.length) {
        out(2 * i) = HexChars((d(i) >> 4) & 0xf)
        out(2 * i + 1) = HexChars(d(i) & 0xf)
        i += 1
      }
      new String(out)
    }
    def decode(row: MediaRow): MediaFeatures = {
      val digest = Sha256Local.get().digest(row.bytes) // digest() resets
      val hex = hexOf(digest)
      def b(i: Int): Int = digest(i) & 0xff
      MediaFeatures(
        media_id = row.media_id,
        kind = row.kind,
        n_bytes = row.bytes.length.toLong,
        sha256 = hex,
        width = 64 + b(0) * 8,
        height = 64 + b(1) * 8,
        duration_ms = if (row.kind == "image") 0L else 1000L + b(2) * 500L,
        feature = Array.tabulate(8)(i => (b(i) / 255.0f) * 2f - 1f))
    }
  }

  /** Decode stage: batch iteration per partition (the shape a real
    * vectorized decoder needs — amortized codec init per partition,
    * streaming batches, no per-row JNI churn). Image rows decode REAL
    * header dimensions ([[ImageHeaderDecoder]]); undecodable payloads
    * and audio/video fall back to the deterministic stub.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // codec/reader registry is JVM-wide; per-row reader instances are
      // disposed inside ImageHeaderDecoder
      rows.map(ImageHeaderDecoder.decode)
    }
  }

  /** Sanity ceiling on container-DECLARED durations used to drive row
    * explosion: a ~76-byte hostile payload can declare ~4e12 ms (WAV
    * with byteRate=1 and data size 0xFFFFFFFF, or an mvhd with
    * timescale=1), which would turn one input row into billions of
    * frame rows. Six hours covers real long-form media; anything above
    * is treated as an implausible header and falls back to the
    * deterministic stub duration (≤128.5 s), honoring the probe's own
    * contract that a scan stage never dies — or explodes — on a
    * hostile payload.
    */
  val DefaultMaxDurationMs: Long = 6L * 3600 * 1000

  /** Decoded duration bounded for stride loops: the probed value when
    * plausible (0 ≤ d ≤ maxDurationMs), the stub value otherwise.
    */
  private def boundedDurationMs(f: MediaFeatures, row: MediaRow, maxDurationMs: Long): Long =
    if (f.duration_ms >= 0 && f.duration_ms <= maxDurationMs) f.duration_ms
    else StubDecoder.decode(row).duration_ms

  final case class FrameRow(
      media_id: Long,
      frame_index: Int,
      ts_ms: Long,
      frame_sha256: String)   // stub frame payload id (real: decoded pixels)

  /** Fixed-stride frame sampling for video rows: one output row per
    * sampled timestamp (`everyMs` apart, from 0 up to the decoded
    * duration). The row-explosion plumbing is real — output cardinality
    * is duration-bounded, each frame row carries its timestamp and a
    * deterministic frame id — while the pixel decode is the honest stub
    * (a real impl slices the decoded stream at ts_ms inside the same
    * mapPartitions, with the codec opened once per partition).
    *
    * Non-video rows emit nothing; a task's output is bounded by its
    * input BYTE budget (see [[repartitionBySize]]), not row count.
    */
  def sampleFrames(
      media: Dataset[MediaRow], everyMs: Long,
      maxDurationMs: Long = DefaultMaxDurationMs): Dataset[FrameRow] = {
    require(everyMs > 0, s"frame stride must be positive, got $everyMs")
    require(maxDurationMs > 0, s"duration ceiling must be positive, got $maxDurationMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.filter(_.kind == "video").flatMap { row =>
        // header-aware: a real MP4/EBML container contributes its REAL
        // duration (bounding the sampled-frame cardinality); payloads
        // with no parseable container — or ones declaring an implausible
        // duration — keep the deterministic stub
        val f = ImageHeaderDecoder.decode(row)
        val dur = boundedDurationMs(f, row, maxDurationMs)
        (0L to dur by everyMs).iterator.zipWithIndex.map { case (ts, i) =>
          // stub frame id: payload digest + timestamp (deterministic)
          sha.reset()
          sha.update(row.bytes)
          sha.update(java.nio.ByteBuffer.allocate(8).putLong(ts).array())
          FrameRow(row.media_id, i, ts, sha.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Batched decode/inference shape: partitions stream through in
    * `batchSize` groups, the contract a vectorized model runner needs
    * (one device transfer per batch, bounded peak memory — never the
    * whole partition materialized). The batch function sees at most
    * `batchSize` rows per call and every row exactly once.
    */
  def decodeBatched(
      media: Dataset[MediaRow], batchSize: Int)(
      batchFn: Seq[MediaRow] => Seq[MediaFeatures]): Dataset[MediaFeatures] = {
    require(batchSize > 0, s"batch size must be positive, got $batchSize")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(batchFn))
  }

  /** Resize/transcode stage: each media row's payload is rewritten to
    * the target dimensions. The Spark-side contract is real — a
    * payload-rewriting `mapPartitions` stage whose OUTPUT byte budget
    * differs from its input (the reason resize runs before shuffle-heavy
    * stages: move small thumbnails, not 4K sources); the pixel work is
    * the honest stub (deterministic bytes derived from payload + target
    * box, sized ∝ target area, aspect preserved within the box like a
    * real thumbnailer).
    */
  def resizeStub(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    require(maxW > 0 && maxH > 0, s"target box must be positive: ${maxW}x$maxH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { row =>
        val f = StubDecoder.decode(row)
        // aspect-preserving fit into the box, never upscale
        val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
        val (w, h) = (math.max(1, (f.width * scale).toInt), math.max(1, (f.height * scale).toInt))
        sha.reset()
        sha.update(row.bytes)
        sha.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
        f.copy(width = w, height = h,
          n_bytes = w.toLong * h * 3, // stub: RGB byte count of the target
          sha256 = sha.digest().map("%02x".format(_)).mkString)
      }
    }
  }

  /** REAL resize stage for decodable images (r10 — PNG/JPEG/GIF/BMP
    * pixels decode with the JDK alone): aspect-preserving integer-area
    * thumbnail, `n_bytes` and `sha256` of the ACTUAL resized RGB
    * payload. Rows whose pixels don't decode (and non-images) fall
    * back to [[resizeStub]]'s deterministic behavior, so the stage
    * never loses rows. Same `mapPartitions` payload-rewriting shape —
    * move thumbnails across the shuffle, not sources.
    */
  def resizeImages(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    require(maxW > 0 && maxH > 0, s"target box must be positive: ${maxW}x$maxH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { row =>
        PixelDecoder.image(row.bytes) match {
          case Some(img) =>
            val (w, h, rgb) = PixelDecoder.resize(img, maxW, maxH)
            sha.reset()
            val f = StubDecoder.decode(row)
            f.copy(width = w, height = h, n_bytes = rgb.length.toLong,
              sha256 = sha.digest(rgb).map("%02x".format(_)).mkString,
              feature = {
                // feature of the RESIZED content: spec-pinned ≈ the
                // original's grid (area averaging commutes up to the
                // integer box boundaries)
                val tmp = new java.awt.image.BufferedImage(
                  w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                var i = 0
                while (i < w * h) {
                  val o = i * 3
                  tmp.setRGB(i % w, i / w,
                    ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
                  i += 1
                }
                PixelDecoder.lumaGrid(tmp, 4, 2)
              })
          case None =>
            // the stub path, inlined (one row, same math as resizeStub)
            val f = StubDecoder.decode(row)
            val scale = math.min(1.0,
              math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
            val (w, h) =
              (math.max(1, (f.width * scale).toInt), math.max(1, (f.height * scale).toInt))
            sha.reset()
            sha.update(row.bytes)
            sha.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
            f.copy(width = w, height = h, n_bytes = w.toLong * h * 3,
              sha256 = sha.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Per-window REAL loudness for WAV-PCM audio rows: one
    * `(media_id, seg_index, start_ms, end_ms, rms)` row per window —
    * the content-bearing twin of [[segmentAudio]] (which emits
    * deterministic segment IDs for any container). Non-PCM rows emit
    * nothing; a caller that needs every row unions with
    * [[segmentAudio]] on the anti-set.
    */
  final case class LoudnessRow(
      media_id: Long, seg_index: Int, start_ms: Long, end_ms: Long,
      rms: Float)

  def segmentLoudness(media: Dataset[MediaRow],
      windowMs: Long): Dataset[LoudnessRow] = {
    require(windowMs > 0, s"window must be positive, got $windowMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "audio").flatMap { row =>
        WavPcm.decode(row.bytes).iterator.flatMap { pcm =>
          val dur = pcm.durationMs
          (0L until dur by windowMs).iterator.zipWithIndex.map { case (start, i) =>
            val end = math.min(start + windowMs, dur)
            val from = (start * pcm.sampleRate / 1000).toInt
            val until = (end * pcm.sampleRate / 1000).toInt
            LoudnessRow(row.media_id, i, start, end,
              WavPcm.rms(pcm.mono, from, until))
          }
        }
      }
    }
  }

  final case class AudioSegment(
      media_id: Long,
      seg_index: Int,
      start_ms: Long,
      end_ms: Long,
      seg_sha256: String)     // stub segment payload id (real: PCM slice)

  /** Fixed-window audio segmentation — [[sampleFrames]]'s twin for
    * audio rows: one row per `windowMs` window up to the decoded
    * duration (last window may be short). Same bounded-explosion
    * plumbing; non-audio rows emit nothing.
    */
  def segmentAudio(
      media: Dataset[MediaRow], windowMs: Long,
      maxDurationMs: Long = DefaultMaxDurationMs): Dataset[AudioSegment] = {
    require(windowMs > 0, s"window must be positive, got $windowMs")
    require(maxDurationMs > 0, s"duration ceiling must be positive, got $maxDurationMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.filter(_.kind == "audio").flatMap { row =>
        // header-aware, like sampleFrames: WAV/EBML duration when the
        // container parses AND declares a plausible length,
        // deterministic stub otherwise
        val f = ImageHeaderDecoder.decode(row)
        val dur = boundedDurationMs(f, row, maxDurationMs)
        (0L until dur by windowMs).iterator.zipWithIndex.map { case (start, i) =>
          sha.reset()
          sha.update(row.bytes)
          sha.update(java.nio.ByteBuffer.allocate(8).putLong(start).array())
          AudioSegment(row.media_id, i, start,
            math.min(start + windowMs, dur),
            sha.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Feature-extraction stage producing an embedding of ARBITRARY
    * width, so media rows feed the whole vector suite (knnGraph /
    * ivfTopK / embeddingPairs want dim ≥ 64; the 8-float
    * [[MediaFeatures]] vector is too narrow). Output:
    * `(media_id, kind, embedding: array<float>)` — the same shape as
    * the `embeddings` table, by design.
    *
    * The extractor is the honest stub (SHA-256 in counter mode:
    * `digest(bytes ‖ ctr)` yields 32 bytes per round until `dim` floats
    * in [−1, 1] are filled — deterministic, so exact-duplicate payloads
    * and ONLY they get cosine 1.0); a real image/audio encoder drops
    * into the same mapPartitions slot, initialized once per partition,
    * batched via [[decodeBatched]] if it wants device-sized groups.
    */
  def embedStub(media: Dataset[MediaRow], dim: Int): DataFrame = {
    require(dim > 0, s"embedding width must be positive, got $dim")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { row =>
        val out = new Array[Float](dim)
        var filled = 0
        var ctr = 0
        while (filled < dim) {
          sha.reset()
          sha.update(row.bytes)
          sha.update(java.nio.ByteBuffer.allocate(4).putInt(ctr).array())
          val d = sha.digest()
          var i = 0
          while (i < d.length && filled < dim) {
            out(filled) = ((d(i) & 0xff) / 255.0f) * 2f - 1f
            filled += 1
            i += 1
          }
          ctr += 1
        }
        (row.media_id, row.kind, out)
      }
    }.toDF("media_id", "kind", "embedding")
  }

  /** CONTENT embedding (r10): decodable images embed as a `dim`-cell
    * area-averaged luminance grid (near-duplicate images — recompressed,
    * slightly rescaled — land NEAR each other in cosine, which the
    * SHA-counter stub can never do: its vectors are orthogonal unless
    * payloads are byte-identical); WAV-PCM audio embeds as a `dim`-bin
    * RMS loudness grid. Everything else falls back to [[embedStub]]'s
    * deterministic vector, so the output covers every row and feeds the
    * same vector suite. `dim` must factor as a grid for images — pass
    * a perfect square or `gw×gh` explicitly via the default split.
    */
  def embedMedia(media: Dataset[MediaRow], dim: Int): DataFrame = {
    require(dim > 0, s"embedding width must be positive, got $dim")
    val gw = math.max(1, math.sqrt(dim.toDouble).toInt)
    val gh = math.max(1, dim / gw)
    require(gw * gh == dim,
      s"dim $dim must factor as a near-square grid (got ${gw}x$gh)")
    val spark = media.sparkSession
    import spark.implicits._
    val stub = embedStub(media, dim).withColumnRenamed("embedding", "__stub")
    val real = media.mapPartitions { rows =>
      rows.map { row =>
        val content: Option[Array[Float]] = row.kind match {
          case "image" =>
            PixelDecoder.image(row.bytes).map(PixelDecoder.lumaGrid(_, gw, gh))
          case "audio" =>
            WavPcm.decode(row.bytes).map(WavPcm.rmsGrid(_, dim))
          case _ => None
        }
        (row.media_id, content)
      }
    }.toDF("media_id", "__real")
    stub.join(real, Seq("media_id"))
      .withColumn("embedding", coalesce(col("__real"), col("__stub")))
      .select(col("media_id"), col("kind"), col("embedding"))
  }

  /** Exact-duplicate media detection by payload hash — same hash-groupBy
    * shape as text dedup, over binary.
    */
  def exactDupMedia(df: DataFrame, idCol: String, bytesCol: String): DataFrame =
    df.groupBy(sha2(col(bytesCol), 256).as("payload_sha256"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Size-aware repartition before a heavy decode stage: range-partition
    * by payload size so each task carries a similar byte budget.
    */
  def repartitionBySize(df: DataFrame, bytesCol: String, partitions: Int): DataFrame =
    df.withColumn("__n_bytes", length(col(bytesCol)))
      .repartitionByRange(partitions, col("__n_bytes"))
      .drop("__n_bytes")
}
