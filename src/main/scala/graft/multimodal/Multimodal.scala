package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract run as batch functions over `mapPartitions`.
  *
  * Codec layer: IMAGE headers decode for real via the JDK's
  * `javax.imageio` ([[ImageHeaderDecoder]] — PNG/JPEG/GIF/BMP width/
  * height from actual headers, no external deps); audio/video remain
  * STUBBED (this container ships no AV codecs): [[StubDecoder]] derives
  * deterministic fake properties from the bytes, and undecodable image
  * payloads fall back to it. Everything Spark-side is real — schema,
  * partition sizing, batch iteration shape — so swapping in a full
  * pixel/AV codec is a one-function change.
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

    /** Full decode contract: real header dimensions when the payload IS
      * an image a JDK reader recognizes; [[StubDecoder]] values (and
      * kinds other than image) otherwise.
      */
    def decode(row: MediaRow): MediaFeatures = {
      val stub = StubDecoder.decode(row)
      if (row.kind != "image") stub
      else dimensions(row.bytes) match {
        case Some((w, h)) => stub.copy(width = w, height = h)
        case None => stub
      }
    }
  }

  /** Deterministic fake decode: dimensions/duration/feature derived
    * from a SHA-256 of the payload. The stand-in for codecs the
    * container doesn't ship (audio/video); image rows get REAL header
    * dimensions via [[ImageHeaderDecoder]]. The signature (one batch
    * in, one batch out) is the contract.
    */
  object StubDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val digest = java.security.MessageDigest.getInstance("SHA-256").digest(row.bytes)
      val hex = digest.map("%02x".format(_)).mkString
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
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    require(everyMs > 0, s"frame stride must be positive, got $everyMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.filter(_.kind == "video").flatMap { row =>
        val f = StubDecoder.decode(row)
        (0L to f.duration_ms by everyMs).iterator.zipWithIndex.map { case (ts, i) =>
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
  def segmentAudio(media: Dataset[MediaRow], windowMs: Long): Dataset[AudioSegment] = {
    require(windowMs > 0, s"window must be positive, got $windowMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.filter(_.kind == "audio").flatMap { row =>
        val f = StubDecoder.decode(row)
        (0L until f.duration_ms by windowMs).iterator.zipWithIndex.map { case (start, i) =>
          sha.reset()
          sha.update(row.bytes)
          sha.update(java.nio.ByteBuffer.allocate(8).putLong(start).array())
          AudioSegment(row.media_id, i, start,
            math.min(start + windowMs, f.duration_ms),
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
