package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.TextAnalysis

/** Incrementally-maintained anchor-text panel over
  * [[TextAnalysis.anchorTextPanel]] (q164 live) — the semantic twin of
  * [[StreamHostGraph]]: per (external target host, normalized anchor),
  * how many links carry that text and how many distinct source pages
  * said it. A live crawl mines this for retrieval-training queries and
  * spam-anchor triage; recomputing it per wave re-reads every page
  * ever fetched.
  *
  * Exactness by sufficient statistics — the [[StreamHostGraph]]
  * argument verbatim, one key wider: anchor rows are per-page facts,
  * so `(host, anchor, n_links, n_pages)` count frames from disjoint
  * batches merge by sum, PROVIDED page ids never repeat across batches
  * (each page's links arrive once — the crawl contract; a re-crawled
  * page is a new version and re-counts). State is (host × distinct
  * anchors)-keyed — bounded by the anchor vocabulary, not by pages.
  */
object StreamAnchorText {

  /** In-memory session: one localCheckpointed count frame. */
  final class AnchorTextSession(spark: SparkSession, idCol: String,
      htmlCol: String) {
    @volatile private var counts: DataFrame = null

    def currentPanel: DataFrame = {
      require(counts != null, "panel requested before any ingest")
      counts
    }

    def ingest(batch: DataFrame): Unit = {
      val delta = TextAnalysis.anchorTextPanel(batch, idCol, htmlCol)
      counts = (if (counts == null) delta else mergeCounts(counts, delta))
        .localCheckpoint()
    }

    def start(pages: DataFrame): StreamingQuery =
      pages.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private[streaming] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("host"), col("anchor")).agg(
      sum(col("n_links")).as("n_links"), sum(col("n_pages")).as("n_pages"))

  private val CountSchema = StructType(Seq(
    StructField("host", StringType), StructField("anchor", StringType),
    StructField("n_links", LongType), StructField("n_pages", LongType)))

  /** Durable session: per-batch deltas in one sum-foldable ledger. */
  final class DurableAnchorTextSession(spark: SparkSession, path: String,
      idCol: String, htmlCol: String, compactEvery: Int = 0) {

    def currentPanel: DataFrame =
      DurableLedger.load(spark, path, CountSchema)
        .groupBy(col("host"), col("anchor")).agg(
          sum(col("n_links")).as("n_links"), sum(col("n_pages")).as("n_pages"))

    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(
        TextAnalysis.anchorTextPanel(batch, idCol, htmlCol), path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, CountSchema, compactEvery)
    }

    def start(pages: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = pages.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }
}
