package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.TextAnalysis

/** Incrementally-maintained host in-degree panel over
  * [[TextAnalysis.outlinkEdges]] (q148 live) — the web-graph side
  * table a crawl keeps current: per target host, how many links and
  * how many distinct source pages point at it. In-degree seeds
  * PageRank priors, frontier prioritization, and spam-hub triage; a
  * live crawl wants it maintained, not recomputed per wave.
  *
  * Exactness by sufficient statistics: edges are per-row facts, so
  * `(host, n_links, n_pages)` count frames from disjoint batches merge
  * by sum — streamed ≡ the batch rollup over everything ingested,
  * PROVIDED page ids never repeat across batches (each page's edges
  * arrive once — the crawl contract; a RE-crawled page is a new
  * version and its host re-counts, which is what a frontier
  * prioritizer wants). State is host-keyed — bounded by distinct
  * hosts, not pages. Durable twin: per-batch deltas, sum-fold at read,
  * replay-safe by overwrite-by-batch-id, compaction free.
  */
object StreamHostGraph {

  /** The batch rollup both forms derive: external edges only (relative
    * links have no host), links + distinct source pages per host.
    */
  def hostInDegree(pages: DataFrame, idCol: String, htmlCol: String): DataFrame =
    TextAnalysis.outlinkEdges(pages, idCol, htmlCol)
      .filter(col("host").isNotNull)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col(idCol)).as("n_pages"))

  /** In-memory session: one localCheckpointed count frame. */
  final class HostGraphSession(spark: SparkSession, idCol: String,
      htmlCol: String) {
    @volatile private var counts: DataFrame = null

    def currentInDegree: DataFrame = {
      require(counts != null, "in-degree requested before any ingest")
      counts
    }

    def ingest(batch: DataFrame): Unit = {
      val delta = hostInDegree(batch, idCol, htmlCol)
      counts = (if (counts == null) delta else mergeCounts(counts, delta))
        .localCheckpoint()
    }

    def start(pages: DataFrame): StreamingQuery =
      pages.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private[streaming] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("host")).agg(
      sum(col("n_links")).as("n_links"), sum(col("n_pages")).as("n_pages"))

  private val CountSchema = StructType(Seq(
    StructField("host", StringType),
    StructField("n_links", LongType), StructField("n_pages", LongType)))

  /** Durable session: per-batch deltas in one sum-foldable ledger. */
  final class DurableHostGraphSession(spark: SparkSession, path: String,
      idCol: String, htmlCol: String, compactEvery: Int = 0) {

    def currentInDegree: DataFrame =
      DurableLedger.load(spark, path, CountSchema)
        .groupBy(col("host")).agg(
          sum(col("n_links")).as("n_links"), sum(col("n_pages")).as("n_pages"))

    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(hostInDegree(batch, idCol, htmlCol), path, batchId)
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
