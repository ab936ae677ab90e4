package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.textops.Dsir

/** [[graft.textops.Dsir]] as a maintained session — the form a live
  * ingestion pipeline runs targeted selection in: documents stream in
  * (each batch tagged with its target membership), the per-bucket
  * count panel folds them, and at any point the CURRENT panel yields
  * the weight table that scores new arrivals. Like
  * [[StreamCrawlControl]], state is a mergeable integer counter panel
  * (bucket-grained, ≤ `buckets` rows — never the corpus), so the
  * equivalence law is UNCONDITIONAL and spec-pinned: the streamed
  * panel after any batch split equals [[Dsir.bucketPanel]] over the
  * union, and therefore so do the fitted weights and every score.
  *
  * The durable twin commits each batch's DELTA panel under its batch
  * id ([[DurableLedger]] OCC — replay publishes identical rows), and
  * the folded panel is one ≤-buckets-row sum over the ledger.
  */
object StreamDsir {

  private def mergeTwo(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket"))
      .agg(sum(col("t_count")).as("t_count"),
        sum(col("r_count")).as("r_count"))

  /** In-memory session over a fixed bucket count. */
  final class DsirSession(textCol: String, isTarget: Column, buckets: Int) {
    @volatile private var panel: DataFrame = null

    def currentPanel: DataFrame = {
      require(panel != null, "panel requested before any ingest")
      panel
    }

    def ingest(docs: DataFrame): Unit = {
      val p = Dsir.bucketPanel(docs, textCol, isTarget, buckets)
      panel = (if (panel == null) p else mergeTwo(panel, p)).localCheckpoint()
    }

    /** The weight table fitted on everything ingested so far. */
    def currentWeights: Array[Long] = Dsir.logRatiosE6(currentPanel, buckets)

    /** Score an arbitrary frame under the current fit. */
    def score(docs: DataFrame, idCol: String): DataFrame =
      Dsir.score(docs, idCol, textCol, currentWeights)

    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private val PanelSchema = StructType(Seq(
    StructField("bucket", LongType), StructField("t_count", LongType),
    StructField("r_count", LongType)))

  /** Durable twin: fixed `(text, is_target)` input columns; each batch
    * commits its delta panel, restart is reopening the path.
    */
  final class DurableDsirSession(spark: SparkSession, path: String,
      buckets: Int, compactEvery: Int = 0) {

    def currentPanel: DataFrame =
      DurableLedger.load(spark, path, PanelSchema)
        .groupBy(col("bucket"))
        .agg(sum(col("t_count")).as("t_count"),
          sum(col("r_count")).as("r_count"))

    def ingest(docs: DataFrame, batchId: Long): Unit = {
      val delta = Dsir.bucketPanel(
        docs.select(col("text"), col("is_target")),
        "text", col("is_target") === 1, buckets)
      DurableLedger.commit(delta, path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, PanelSchema, compactEvery)
    }

    def currentWeights: Array[Long] = Dsir.logRatiosE6(currentPanel, buckets)

    def score(docs: DataFrame, idCol: String, textCol: String): DataFrame =
      Dsir.score(docs, idCol, textCol, currentWeights)

    def start(docs: DataFrame,
        checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingest(batch, batchId)
      }.start()
    }
  }
}
