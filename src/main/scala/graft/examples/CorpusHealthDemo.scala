package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{StreamDrift, StreamJsd, StreamPmi}

/** The corpus-health monitors composed as ONE live observability
  * panel — what a curation team watches while a new crawl streams in,
  * at demo scale over foreachBatch-style manual batches. Run:
  * `sbt "runMain graft.examples.CorpusHealthDemo"`.
  *
  * Three maintained panels share one ingest loop, each exact-by-
  * sufficient-statistics (ledger-merged counts ≡ the batch operator
  * over everything ingested, doubles included):
  *
  *  1. [[StreamDrift]] — chi-square "what changed vs the reference
  *     crawl": the drift alarm that catches a scraper regression or
  *     topical shift per-word;
  *  2. [[StreamJsd]] — the pairwise language-divergence matrix: the
  *     mixing-policy panel (a language drifting away from the others
  *     means its source mix moved);
  *  3. [[StreamPmi]] — the collocation watch-list: new high-PMI pairs
  *     arriving mid-stream are candidate boilerplate templates or
  *     vocabulary phrases.
  *
  * All three fold additive count deltas — O(batch) ingest, bounded
  * derived tables — and their durable twins put the same state in
  * parquet ledgers (see the session scaladocs); this demo runs the
  * in-memory twins for brevity.
  */
object CorpusHealthDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-corpus-health")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"text")
    // the reference crawl: two thirds of the corpus; the "new crawl"
    // streams in with an injected drift term to light the alarms up
    val ref = docs.filter($"doc_id" % 3 =!= 0)
    val incoming = docs.filter($"doc_id" % 3 === 0)
      .withColumn("text",
        when($"doc_id" % 2 === 0,
          concat($"text", lit(" casino casino bonus spins")))
          .otherwise($"text"))

    val drift = new StreamDrift.DriftSession(spark, ref, "text",
      minTotal = 5, k = 8)
    val jsd = new StreamJsd.JsdSession(spark, "lang", "text",
      Seq("de", "en", "es", "fr", "zh"))
    val pmi = new StreamPmi.PmiSession(spark, "text", minCount = 3, k = 8)

    val batches = incoming.withColumn("b", $"doc_id" % 4)
    (0 until 4).foreach { b =>
      val batch = batches.filter($"b" === b).drop("b")
      drift.ingest(batch)
      jsd.ingest(batch)
      pmi.ingest(batch)
      println(s"=== after batch $b (${batch.count()} docs) ===")
      println("-- drift vs reference (top words by chi-square):")
      drift.currentDrift.show(4, truncate = false)
    }

    println("-- final language-divergence matrix:")
    jsd.currentJsd.orderBy($"g_a", $"g_b").show(10, truncate = false)
    println("-- final collocation watch-list (top PMI ratios):")
    pmi.currentPmi.show(8, truncate = false)

    spark.stop()
  }
}
