package graft.sources

import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the windowed `bytesAt` EOF contract: a range past the file end
  * must throw (the old positioned readFully's EOFException), never
  * return a zero-padded buffer — `load()` clamps to fileLen, so without
  * the explicit re-check a truncated/corrupt WARC would silently yield
  * zero-filled payload bytes to a future caller that does not pre-clamp
  * (every current caller clamps; this is the defense-in-depth pin).
  */
class WarcBytesAtSpec extends AnyFunSuite {

  private def readerOver(bytes: Array[Byte]): WarcChunkReader = {
    val f = Files.createTempFile("bytesat", ".warc")
    Files.write(f, bytes)
    f.toFile.deleteOnExit()
    val chunk = WarcChunk(f.toString, 0L, bytes.length.toLong,
      bytes.length.toLong, None)
    new WarcChunkReader(chunk, new StructType(), Array.empty,
      recordGzip = false, new SerializableHadoopConf(new Configuration()))
  }

  test("bytesAt serves in-bounds ranges through the window") {
    val data = (0 until 64).map(_.toByte).toArray
    val r = readerOver(data)
    try {
      assert(r.bytesAt(0L, 64).toSeq == data.toSeq)
      assert(r.bytesAt(60L, 4).toSeq == data.slice(60, 64).toSeq)
    } finally r.close()
  }

  test("bytesAt past EOF throws EOFException, never zero-pads") {
    val data = (1 to 16).map(_.toByte).toArray
    val r = readerOver(data)
    try {
      // overlapping EOF: 4 real bytes + 6 past the end — the old copy
      // returned [13,14,15,16,0,0,0,0,0,0]; it must throw instead
      intercept[java.io.EOFException] { r.bytesAt(12L, 10) }
      // fully past EOF
      intercept[java.io.EOFException] { r.bytesAt(100L, 4) }
      // the window is still usable after a failed over-read
      assert(r.bytesAt(12L, 4).toSeq == data.slice(12, 16).toSeq)
    } finally r.close()
  }
}
