package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the r13 gzip-member writer rework (reusable
  * per-thread Deflater + hand-written header/trailer): the emitted
  * bytes must be IDENTICAL to `GZIPOutputStream`'s — the rename
  * protocol treats same-identity files as byte-equal duplicates, so a
  * byte drift between old and new writers (or between calls) would be
  * a silent format change. Round-trip/corruption laws live in
  * WarcSourceSpec; this suite pins the byte identity and the reuse.
  */
class GzipMembersSpec extends AnyFunSuite {

  private def reference(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data)
    gz.finish()
    gz.close()
    bos.toByteArray
  }

  test("gzipMember emits byte-identical output to GZIPOutputStream") {
    val cases = Seq(
      Array.emptyByteArray,
      "WARC/1.0\r\npayload".getBytes(UTF_8),
      ("lorem ipsum " * 500).getBytes(UTF_8),
      Array.tabulate(70000)(i => (i * 31 % 251).toByte)) // > one deflate buffer
    cases.foreach { data =>
      assert(graft.sources.GzipMembers.gzipMember(data).toSeq ===
        reference(data).toSeq, s"len=${data.length}")
    }
  }

  test("the reused thread-local Deflater is reset between members") {
    val a = "first member".getBytes(UTF_8)
    val b = "second, different member".getBytes(UTF_8)
    // interleave: reuse must not leak state across calls on one thread
    val first = graft.sources.GzipMembers.gzipMember(a)
    val second = graft.sources.GzipMembers.gzipMember(b)
    val firstAgain = graft.sources.GzipMembers.gzipMember(a)
    assert(first.toSeq === firstAgain.toSeq)
    assert(second.toSeq === reference(b).toSeq)
    // and each member still round-trips standalone
    val read = (m: Array[Byte]) => (o: Long, l: Int) =>
      java.util.Arrays.copyOfRange(m, o.toInt, o.toInt + l)
    val got = graft.sources.GzipMembers.readMember(
      read(first), 0L, first.length.toLong)
    assert(got != null && got._1.toSeq === a.toSeq)
  }
}
