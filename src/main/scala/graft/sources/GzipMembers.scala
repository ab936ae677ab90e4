package graft.sources

import java.util.zip.{CRC32, Inflater}

/** Per-member gzip access for RECORD-GZIP WARC segments — the layout
  * CommonCrawl actually ships (`.warc.gz` = one gzip MEMBER per WARC
  * record, members concatenated): member boundaries ARE record
  * boundaries, which is what makes a compressed segment SPLITTABLE —
  * a reader entering mid-file syncs to the next member header and
  * validates it by full decompression (CRC32 + ISIZE trailer check +
  * the decompressed bytes starting with `WARC/1.0\r\n`), so a stray
  * `1f 8b 08` inside compressed data cannot false-sync.
  *
  * JDK-only: gzip header parsed by hand (FEXTRA/FNAME/FCOMMENT/FHCRC
  * optional fields skipped), raw-deflate body via `Inflater(nowrap)`,
  * trailer verified. `GZIPInputStream` is NOT used here because it
  * transparently concatenates members without reporting compressed
  * offsets — exactly the information member-at-a-time access needs.
  */
object GzipMembers {

  /** Decompress ONE gzip member starting at absolute offset `off`.
    * `bytesAt(off, len)` reads absolute file ranges (positioned
    * reads). Returns `(decompressed, compressedMemberLength)` or null
    * when the bytes at `off` are not a complete valid member.
    * `maxOut` bounds runaway decompression from a corrupt candidate.
    */
  def readMember(bytesAt: (Long, Int) => Array[Byte], off: Long,
      fileLen: Long, maxOut: Int = 1 << 28): (Array[Byte], Long) = {
    if (off + 18 > fileLen) return null // min header(10) + trailer(8)
    val headLen = math.min(1 << 16, (fileLen - off).toInt)
    val head = bytesAt(off, headLen)
    if (head(0) != 0x1f.toByte || head(1) != 0x8b.toByte || head(2) != 8)
      return null
    val flg = head(3) & 0xff
    var p = 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > head.length) return null
      p += 2 + ((head(p) & 0xff) | ((head(p + 1) & 0xff) << 8))
    }
    def skipZeroTerminated(): Boolean = {
      while (p < head.length && head(p) != 0) p += 1
      if (p >= head.length) false else { p += 1; true }
    }
    if ((flg & 8) != 0 && !skipZeroTerminated()) return null // FNAME
    if ((flg & 16) != 0 && !skipZeroTerminated()) return null // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p >= head.length) return null
    val inf = new Inflater(true)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val outBuf = new Array[Byte](1 << 16)
      var inPos = off + p
      var fed = 0L
      while (!inf.finished()) {
        if (inf.needsInput()) {
          if (inPos >= fileLen) return null // truncated member
          val chunk = bytesAt(inPos,
            math.min(1 << 16, (fileLen - inPos).toInt))
          inf.setInput(chunk)
          inPos += chunk.length
          fed += chunk.length
        }
        // a FALSE magic candidate (a `1f 8b 08` triple inside some
        // real member's compressed data) usually yields garbage
        // deflate that THROWS DataFormatException rather than
        // decoding to a CRC mismatch — that is "not a valid member",
        // the null contract, not a task failure (r12: a split-sync
        // scan crashed on exactly this, surfacing only under layouts
        // whose record order produced the false triple)
        val n =
          try inf.inflate(outBuf)
          catch { case _: java.util.zip.DataFormatException => return null }
        if (n == 0 && inf.needsDictionary()) return null
        out.write(outBuf, 0, n)
        if (out.size() > maxOut) return null
      }
      val deflateLen = fed - inf.getRemaining
      val trailerOff = off + p + deflateLen
      if (trailerOff + 8 > fileLen) return null
      val tr = bytesAt(trailerOff, 8)
      val data = out.toByteArray
      val crc = new CRC32()
      crc.update(data)
      def le32(i: Int): Long =
        (tr(i) & 0xffL) | ((tr(i + 1) & 0xffL) << 8) |
          ((tr(i + 2) & 0xffL) << 16) | ((tr(i + 3) & 0xffL) << 24)
      if (le32(0) != crc.getValue) return null
      if (le32(4) != (data.length & 0xffffffffL)) return null
      (data, trailerOff + 8 - off)
    } finally inf.end()
  }

  // One Deflater per writer thread, reset per member: record-gzip
  // writes one member PER RECORD, and a fresh GZIPOutputStream there
  // allocated (and finalizer-released) a native zlib stream per record
  // — the dominant per-record cost for small records. Bounded: one
  // ~256 KiB native context per pool thread, reused for the thread's
  // lifetime. Same level/strategy as GZIPOutputStream, so the emitted
  // bytes are identical to the previous implementation's.
  private val threadDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }

  /** One record's bytes as a standalone gzip member (the write side):
    * the fixed 10-byte header (FLG/MTIME/XFL zero, OS 0xFF "unknown" —
    * what `GZIPOutputStream` writes since JDK 16, JDK-8244706; on JDK
    * <= 15 it wrote OS 0, so the byte-identity pin in GzipMembersSpec
    * assumes JDK 16+), raw deflate body, CRC32+ISIZE trailer. The
    * per-thread Deflater's native zlib context is never `end()`ed —
    * bounded at one per pool thread here; a long-lived executor with
    * thread churn relies on Deflater's Cleaner to reclaim them.
    */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val d = threadDeflater.get()
    d.reset()
    d.setInput(data)
    d.finish()
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    // OS byte 0xFF = "unknown", matching GZIPOutputStream exactly
    // (byte-identity spec-pinned in GzipMembersSpec)
    bos.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte))
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    val crc = new CRC32()
    crc.update(data)
    val c = crc.getValue
    val isize = data.length.toLong & 0xffffffffL
    val tr = new Array[Byte](8)
    var i = 0
    while (i < 4) {
      tr(i) = ((c >>> (8 * i)) & 0xff).toByte
      tr(4 + i) = ((isize >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    bos.write(tr)
    bos.toByteArray
  }
}
