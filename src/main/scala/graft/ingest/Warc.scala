package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC/1.0 record codec (ISO 28500 subset — the CommonCrawl container
  * every public web corpus ships in). Records are length-delimited:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: <uri>\r\n
  * WARC-Date: <iso8601>\r\n
  * Content-Length: <payload bytes>\r\n
  * \r\n
  * <payload>\r\n
  * \r\n
  * }}}
  *
  * The parser honors `Content-Length` — the payload may contain CRLFs
  * and even a verbatim `WARC/1.0` line (spec'd; a split-based reader
  * silently shreds such records, which is why real WARC tooling never
  * splits). Unknown headers are kept out of the record but skipped
  * correctly; a malformed record header skips one line and rescans, so
  * one bad record can't sink the rest of the blob.
  *
  * Scale shape: blobs parse independently per row (one crawl segment
  * per row — the CommonCrawl layout), so ingest is a flatMap over the
  * segment table; no state, no shuffle.
  */
object Warc {

  final case class WarcRecord(
      warcType: String, targetUri: String, date: String,
      payload: Array[Byte])

  /** Serialize records back-to-back (writer twin of [[parse]]). */
  def format(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach { r =>
      val head = s"WARC/1.0\r\nWARC-Type: ${r.warcType}\r\n" +
        s"WARC-Target-URI: ${r.targetUri}\r\nWARC-Date: ${r.date}\r\n" +
        s"Content-Length: ${r.payload.length}\r\n\r\n"
      bos.write(head.getBytes(UTF_8))
      bos.write(r.payload)
      bos.write("\r\n\r\n".getBytes(UTF_8))
    }
    bos.toByteArray
  }

  /** Length-honoring record scan. */
  def parse(bytes: Array[Byte]): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    val n = bytes.length
    def lineEnd(from: Int): Int = {
      var j = from
      while (j + 1 < n && !(bytes(j) == '\r' && bytes(j + 1) == '\n')) j += 1
      if (j + 1 < n) j else -1
    }
    var i = 0
    while (i < n) {
      val le = lineEnd(i)
      if (le < 0) i = n
      else if (new String(bytes, i, le - i, UTF_8) != "WARC/1.0") i = le + 2
      else {
        var j = le + 2
        var blank = false
        var ok = true
        val headers = scala.collection.mutable.Map.empty[String, String]
        while (!blank && ok) {
          val he = lineEnd(j)
          if (he < 0) ok = false
          else if (he == j) { blank = true; j += 2 }
          else {
            val h = new String(bytes, j, he - j, UTF_8)
            val ci = h.indexOf(':')
            if (ci > 0)
              headers(h.substring(0, ci).trim.toLowerCase) =
                h.substring(ci + 1).trim
            j = he + 2
          }
        }
        val len = headers.get("content-length")
          .flatMap(s => scala.util.Try(s.toInt).toOption)
        if (!ok || len.isEmpty || len.get < 0 || j + len.get > n) {
          // malformed: skip the version line, rescan from the next line
          i = le + 2
        } else {
          out += WarcRecord(
            headers.getOrElse("warc-type", ""),
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("warc-date", ""),
            java.util.Arrays.copyOfRange(bytes, j, j + len.get))
          i = j + len.get
          var skips = 0
          while (skips < 2 && i + 1 < n &&
                 bytes(i) == '\r' && bytes(i + 1) == '\n') { i += 2; skips += 1 }
        }
      }
    }
    out.result()
  }

  private val parseUdf = udf { (blob: Array[Byte]) =>
    if (blob == null) Seq.empty[(String, String, String, Array[Byte])]
    else parse(blob).map(r => (r.warcType, r.targetUri, r.date, r.payload))
  }

  /** Explode a blob column (binary) into one row per WARC record:
    * `(warc_type, target_uri, warc_date, payload)`.
    */
  def records(df: DataFrame, blobCol: Column): DataFrame =
    df.withColumn("__rec", explode(parseUdf(blobCol)))
      .withColumn("warc_type", col("__rec._1"))
      .withColumn("target_uri", col("__rec._2"))
      .withColumn("warc_date", col("__rec._3"))
      .withColumn("payload", col("__rec._4"))
      .drop("__rec")

  /** Split an HTTP response message (a WARC `response` payload, as a
    * string — headers are ASCII by RFC 9112) into
    * `(http_status, content_type, body)`: head = everything before the
    * first blank line, status from the status line, media type from
    * the (case-insensitive) Content-Type header with parameters
    * stripped, body = everything after. A payload with no blank line
    * yields an empty body and whatever the regexes find — never an
    * error. Pure per-row column expressions (codegen'd, no UDF).
    */
  def httpParts(payload: Column): Column = {
    val sep = instr(payload, "\r\n\r\n")
    val head = when(sep > 0, payload.substr(lit(1), sep - 1)).otherwise(payload)
    val body = when(sep > 0, payload.substr(sep + lit(4), length(payload)))
      .otherwise(lit(""))
    struct(
      regexp_extract(head, "^HTTP/1\\.[01] (\\d{3})", 1).cast("int")
        .as("http_status"),
      lower(trim(regexp_extract(head, "(?im)^content-type:\\s*([^;\\r\\n]+)", 1)))
        .as("content_type"),
      body.as("body"))
  }
}
