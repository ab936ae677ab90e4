package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{StreamContamination, StreamCorpusOverlap,
  StreamLengthStats, StreamSearchIndex, StreamSpanDedup, StreamVectorIndex}
import graft.textops.{CurationOps, TextAnalysis}
import graft.vectors.Vectors

/** The streaming twins composed as ONE live curation pipeline — what a
  * continuously-ingesting corpus runs on every micro-batch, at demo
  * scale over a MemoryStream. Run:
  * `sbt "runMain graft.examples.StreamingCurationDemo"`.
  *
  * Per micro-batch, inside a single foreachBatch:
  *
  *  1. stateless gates first (encoding anomalies, Gopher quality,
  *     contamination vs a static benchmark) — per-row column math, no
  *     state, documents drop the moment they arrive;
  *  2. survivors probe the DURABLE span-dedup ledger — dedup against
  *     the whole corpus HISTORY at O(batch) cost, exactly-once commits;
  *  3. deduped survivors embed (stub at demo scale) into the durable
  *     IVF index (searchable the moment the batch commits) and fold
  *     into the durable bottom-k overlap sketch (corpus-vs-benchmark
  *     drift, k longs of state);
  *  4. every session auto-compacts its ledgers every 2 batches — the
  *     maintenance turn runs inline, file counts stay bounded.
  *
  * All of it survives a process restart: the only state is in the
  * parquet ledgers (plus the streaming checkpoint in a real deploy).
  */
object StreamingCurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-curation")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val docs = Tables.load(spark, sfDir, "documents").select($"doc_id", $"text")
    val bench = docs.filter($"doc_id" % 10 === 0)

    val span = new StreamSpanDedup.DurableSpanDedupSession(
      spark, s"$base/span-ledger", "doc_id", "text",
      shingleWords = 3, winnowRadius = 2, compactEvery = 2)
    val centers = Vectors.hyperplanes(8, 16, seed = 5)
    val ivf = new StreamVectorIndex.DurableIvfIndexSession(
      spark, s"$base/ivf-index", "doc_id", "emb", centers, compactEvery = 2)
    val sketch = new StreamCorpusOverlap.DurableOverlapSession(
      spark, s"$base/kmv", "text", k = 128, compactEvery = 2)
    val benchSketch = StreamCorpusOverlap.sketch(bench, "text", 128)
    val search = new StreamSearchIndex.DurableSearchIndexSession(
      spark, s"$base/search", "doc_id", "text", compactEvery = 2)
    val lenStats = new StreamLengthStats.DurableLengthStatsSession(
      spark, s"$base/lenstats", "corpus", "text", compactEvery = 2)

    def embedded(df: DataFrame) =
      graft.multimodal.Multimodal.embedStub(
        df.select($"doc_id".as("media_id"), lit("text").as("kind"),
            $"text".cast("binary").as("bytes"), lit("demo").as("source"))
          .as[graft.multimodal.Multimodal.MediaRow], dim = 16)
        .toDF().select($"media_id".as("doc_id"), $"embedding".as("emb"))

    var ingested, gated, admitted = 0L
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint()
        ingested += b.count()
        // 1. stateless gates: encoding anomalies + Gopher rules +
        //    contamination, all per-row against broadcast state
        val clean = TextAnalysis.encodingAnomalies(b, "doc_id", "text")
          .filter($"keep" === 1).select($"doc_id")
        val quality = CurationOps.qualityGate(b, "doc_id", "text")
          .filter($"keep" === 1).select($"doc_id")
        val uncontaminated = StreamContamination
          .scoreStream(b, bench, "doc_id", "text", n = 3)
          .filter($"contamination" < 0.5).select($"doc_id")
        val survivors = b
          .join(clean, "doc_id").join(quality, "doc_id")
          .join(uncontaminated, "doc_id")
          .localCheckpoint()
        gated += survivors.count()
        // 2. corpus-history dedup through the durable ledger
        val out = span.ingest(survivors, batchId)
        val kept = survivors.join(
          out.filter($"n_chunks" > $"n_dropped").select($"doc_id"), "doc_id")
        admitted += kept.count()
        // 3. durable indexes + maintained statistics: vector index,
        //    overlap sketch, live BM25/QL search index, exact length
        //    percentiles — all advance per batch, all restart-safe
        ivf.ingest(embedded(kept), batchId)
        sketch.ingest(kept, batchId)
        search.ingest(kept, batchId)
        lenStats.ingest(kept.withColumn("corpus", lit("all")), batchId)
        ()
      }
      .start()

    val rows = docs.as[(Long, String)].collect().toSeq
    rows.grouped((rows.size + 3) / 4).foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    }
    q.stop()

    val est = sketch.overlapWith(benchSketch)
    val probe = embedded(docs.limit(3))
    val hits = ivf.search(probe, k = 3, nProbe = centers.length)
    println(f"ingested:  $ingested%5d docs across 4 micro-batches")
    println(f"gated:     $gated%5d past encoding+quality+contamination")
    println(f"admitted:  $admitted%5d with novel content after history dedup")
    println(f"index:     ${ivf.index.count()}%5d vectors (probe search -> ${hits.count()} rows)")
    println(f"vs bench:  est Jaccard ${est.estJaccard}%.3f, est union ${est.estUnion}%.0f shingles")
    val top = search.searchBm25(Seq("spark", "join", "window"), 3)
      .select($"id", $"score").as[(Long, Double)].collect()
    println(s"live search: bm25 top-3 for [spark join window] -> " +
      top.map { case (id, s) => f"$id:$s%.3f" }.mkString(", "))
    val ls = lenStats.currentStats
      .select($"n_docs", $"p50_tokens", $"p99_tokens")
      .as[(Long, Double, Double)].head()
    println(f"length stats: ${ls._1} admitted docs, p50 ${ls._2}%.1f / p99 ${ls._3}%.1f tokens (exact, maintained)")
    spark.stop()
  }
}
