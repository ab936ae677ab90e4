package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Incrementally-maintained keep-best dedup panel over
  * [[CurationOps.keepBestPanel]] (q172 live) — the survivor set a
  * rolling crawl keeps current: per normalized-content key, the
  * highest-quality representative seen so far and the group size. A
  * re-fetched page variant either loses (the panel is unchanged) or
  * wins (the survivor swaps) — no old text is ever re-read.
  *
  * Exactness by sufficient statistics: the winner is
  * argmax(quality, then smallest id) — a TOTAL order, so argmax over
  * any batching associates and commutes — and sizes are additive
  * counts, PROVIDED doc ids never repeat across batches (the crawl
  * contract shared with [[StreamHostGraph]]). State is keyed by the
  * md5 dedup key: bounded by distinct content, not arrivals. The
  * durable twin's ledger fold is the same argmax+sum, so compaction
  * is a pure fold and replay overwrites by batch id.
  */
object StreamKeepBest {

  /** In-memory session: one localCheckpointed panel frame. */
  final class KeepBestSession(spark: SparkSession, idCol: String,
      textCol: String, qualityCol: String) {
    @volatile private var panel: DataFrame = null

    def currentPanel: DataFrame = {
      require(panel != null, "panel requested before any ingest")
      panel
    }

    def ingest(batch: DataFrame): Unit = {
      val delta = CurationOps.keepBestPanel(batch, idCol, textCol, qualityCol)
      panel = (if (panel == null) delta else mergePanels(panel, delta))
        .localCheckpoint()
    }

    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private[streaming] def mergePanels(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("key"))
      .agg(max(struct(col("win_quality"),
          negate(col("win_id")).as("nid"))).as("__mx"),
        sum(col("group_size")).as("group_size"))
      .select(col("key"),
        negate(col("__mx").getField("nid")).as("win_id"),
        col("__mx").getField("win_quality").as("win_quality"),
        col("group_size"))

  private val PanelSchema = StructType(Seq(
    StructField("key", StringType), StructField("win_id", LongType),
    StructField("win_quality", LongType), StructField("group_size", LongType)))

  /** Durable session: per-batch panels in an argmax+sum-foldable
    * ledger.
    */
  final class DurableKeepBestSession(spark: SparkSession, path: String,
      idCol: String, textCol: String, qualityCol: String,
      compactEvery: Int = 0) {

    def currentPanel: DataFrame = mergeFold(
      DurableLedger.load(spark, path, PanelSchema))

    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(
        CurationOps.keepBestPanel(batch, idCol, textCol, qualityCol),
        path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, PanelSchema, compactEvery)
    }

    def start(docs: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }

  /** The read-time fold over stacked ledger batches: identical to
    * [[mergePanels]] (compaction just concatenates batch rows — the
    * fold is applied at read, the StreamHostGraph convention).
    */
  private def mergeFold(df: DataFrame): DataFrame =
    mergePanels(df, df.limit(0))
}
