package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.Warc
import graft.textops.{CurationOps, TextAnalysis}

/** The web front door composed end-to-end — what stands between a
  * crawl archive and a training corpus, at demo scale. Run:
  * `sbt "runMain graft.examples.WebIngestDemo"`.
  *
  * WARC segments (q136's codec) → HTTP split (q137: drop non-200,
  * non-HTML) → HTML→text extraction (q135: strip chain + markup
  * signals) → C4 line cleaning (q123) → Gopher-style quality gate
  * (q36) → exact dedup. Every stage is per-row column math until the
  * final dedup's min-struct aggregate — at 100 TB the whole front door
  * is a map over the archive scan.
  */
object WebIngestDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-web-ingest")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- synthesize the crawl: one WARC blob per source, each record
    // an HTTP response wrapping an HTML page (bad statuses and JSON
    // endpoints mixed in, the real-archive composition)
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"source", $"text")
    val status = when($"doc_id" % 9 === 0, lit(404)).otherwise(lit(200))
    val ctype = when($"doc_id" % 11 === 0, lit("application/json"))
      .otherwise(lit("text/html"))
    val page = concat(lit("<html><head><script>x()</script></head><body><h1>Doc "),
      $"doc_id", lit("</h1><p>"), $"text",
      lit(".</p><!-- f --><footer><a href=\"/a\">about us.</a></footer></body></html>"))
    val http = concat(lit("HTTP/1.1 "), status,
      lit(" X\r\nContent-Type: "), ctype, lit("\r\n\r\n"), page)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://ex.test/doc/"),
      $"doc_id", lit("\r\nWARC-Date: 2026-08-15T00:00:00Z\r\nContent-Length: "),
      octet_length(http), lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    val blobs = docs.select($"source", $"doc_id", rec.as("rec"))
      .groupBy($"source")
      .agg(array_join(transform(array_sort(collect_list(struct($"doc_id", $"rec"))),
        x => x.getField("rec")), "").as("blob"))
    println(s"crawl: ${blobs.count()} WARC segments")

    // ---- the crawl store ON DISK: the same records written as a
    // host-partitioned gzip segment store through format("warc") and
    // read back through the DSv2 scan (record-boundary splits, host
    // pruning) — the file-level front door a real 100 TB archive uses
    val store = java.nio.file.Files.createTempDirectory("webingest").toString
    Warc.records(blobs.withColumnRenamed("source", "host"),
        $"blob".cast("binary"))
      .select($"host", $"warc_type", $"target_uri",
        $"warc_date", $"payload")
      .write.format("warc").option("partitionByHost", "true")
      .option("compress", "gzip").mode("append").save(store)
    val scanned = spark.read.format("warc").load(store)
    println(s"store: ${scanned.count()} records from " +
      s"${scanned.select($"segment").distinct().count()} segment files " +
      s"(${scanned.where($"host" === "src1").count()} on src1 via a pruned scan)")

    // ---- the LIVE archive loop: a crawl stream lands in a second
    // store through the STREAMING sink (epoch-deterministic file
    // names, replay-idempotent renames) and the batch scan reads the
    // archive back — crawl → archive → extract entirely on
    // format("warc")
    val liveStore = java.nio.file.Files.createTempDirectory("webingest-live").toString
    val liveCkpt = java.nio.file.Files.createTempDirectory("webingest-ckpt").toString
    val liveQ = spark.readStream.format("warc").load(store)
      .select($"host", $"warc_type", $"target_uri", $"warc_date", $"payload")
      .writeStream.format("warc")
      .option("partitionByHost", "true")
      .option("checkpointLocation", liveCkpt)
      .outputMode("append")
      .start(liveStore)
    liveQ.processAllAvailable()
    liveQ.stop()
    val archived = spark.read.format("warc").load(liveStore)
    println(s"archive: streaming sink re-archived ${archived.count()} records " +
      s"across ${archived.select($"segment").distinct().count()} epoch files")

    // ---- the front door
    val responses = Warc.records(blobs, $"blob".cast("binary"))
      .select($"target_uri",
        Warc.httpParts($"payload".cast("string")).as("h"))
      .select($"target_uri", $"h.http_status".as("st"),
        $"h.content_type".as("ct"), $"h.body".as("body"))
    val fetched = responses.count()
    val html = responses.filter($"st" === 200 && $"ct" === "text/html")
    println(s"http: $fetched responses, ${html.count()} are 200 text/html")

    val extracted = TextAnalysis.htmlExtract(
      html.select(regexp_extract($"target_uri", "doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), $"body"), "doc_id", "body")
    val cleaned = TextAnalysis.c4LineFilter(
      extracted.select($"doc_id", $"text_extracted".as("text")),
      "doc_id", "text")
    println(s"extract: median text ratio ${"%.3f".format(
      extracted.stat.approxQuantile("text_ratio", Array(0.5), 0.01).head)}, " +
      s"${cleaned.agg(sum($"n_kept")).as[Long].head()} clean lines kept")

    val gated = CurationOps.qualityGate(
      extracted.select($"doc_id", $"text_extracted".as("text")), "doc_id", "text")
    val kept = gated.filter($"keep" === 1)
    println(s"quality: ${kept.count()} of ${gated.count()} docs pass the Gopher gate")

    val deduped = kept.join(
      extracted.select($"doc_id", md5($"text_extracted").as("h")), "doc_id")
      .groupBy($"h").agg(min($"doc_id").as("doc_id"))
    println(s"dedup: ${deduped.count()} unique docs enter the corpus")
    spark.stop()
  }
}
