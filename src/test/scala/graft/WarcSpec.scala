package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.ingest.Warc
import graft.ingest.Warc.WarcRecord

/** WARC codec: byte-exact round trip, Content-Length-honoring parse
  * (payloads containing CRLFs and verbatim "WARC/1.0" lines), malformed
  * and truncated-record resilience.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, payload: String) =
    WarcRecord("response", uri, "2026-08-15T00:00:00Z", payload.getBytes(UTF_8))

  test("round trip is byte-exact, traps included") {
    val recs = Seq(
      rec("https://a.test/1", "plain body"),
      rec("https://a.test/2", "line one\r\nline two\r\n"),
      // the split-breaker: a full fake record inside the payload
      rec("https://a.test/3",
        "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\ntail"),
      rec("https://a.test/4", "")) // empty payload
    val bytes = Warc.format(recs)
    val back = Warc.parse(bytes)
    assert(back.length === 4)
    back.zip(recs).foreach { case (b, r) =>
      assert(b.targetUri === r.targetUri)
      assert(b.payload.toSeq === r.payload.toSeq)
    }
    // format(parse(x)) reproduces the bytes exactly
    assert(Warc.format(back).toSeq === bytes.toSeq)
  }

  test("malformed and truncated records skip without sinking the blob") {
    val good = rec("https://a.test/ok", "good payload")
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\noops\r\n\r\n".getBytes(UTF_8)
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort"
      .getBytes(UTF_8)
    val garbagePrefix = "not a warc header\r\n".getBytes(UTF_8)
    val blob = garbagePrefix ++ noLen ++ Warc.format(Seq(good)) ++ truncated
    val back = Warc.parse(blob)
    assert(back.length === 1)
    assert(back.head.targetUri === "https://a.test/ok")
  }

  test("records() explodes blobs row-per-record with binary payloads") {
    val blob = Warc.format(Seq(rec("https://a.test/1", "alpha"),
      rec("https://a.test/2", "beta\r\ngamma")))
    val df = Seq(Tuple1(blob)).toDF("blob")
    val out = Warc.records(df, $"blob").orderBy($"target_uri")
      .select($"target_uri", $"payload").as[(String, Array[Byte])].collect()
    assert(out.map(_._1).toSeq === Seq("https://a.test/1", "https://a.test/2"))
    assert(new String(out(1)._2, UTF_8) === "beta\r\ngamma")
  }
}
