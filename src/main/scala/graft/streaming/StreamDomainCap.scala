package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Streaming twin of [[CurationOps.domainCapRetention]] (q110) — a
  * maintained per-domain quality budget over a document stream: at
  * any point, the retained set is the k BEST documents per eTLD+1
  * (quality desc, id tiebreak) of everything ingested so far.
  *
  * Same mergeable-state argument as [[StreamSample]]: top-k under a
  * TOTAL order is a bottom-k sketch over the ordering key
  * `(-quality, id)` — the top-k of a union is the top-k of the
  * concatenated per-part top-k's — so the stream state IS the
  * retained set (k·|domains| rows), every batch folds in its own
  * pruned top-k associatively, and the maintained retention is
  * BIT-IDENTICAL to the batch operator over everything ingested
  * (rank column included, spec-pinned). Redelivery contract: a
  * replayed batch reproduces identical rows, which collapse in the
  * (domain, id) dedup — same as the other document sessions.
  *
  * [[DurableDomainCapSession]] commits each batch's pruned top-k to a
  * [[DurableLedger]]; read folds by concat → distinct → rank, so
  * compaction never changes the retained set. Durable rows are
  * `(doc_id, domain, quality)` — the budget decision needs no text.
  */
object StreamDomainCap {

  /** Rank-prune to each domain's top-k by the batch operator's exact
    * order.
    */
  private def pruneTopK(df: DataFrame, idCol: String, domainCol: String,
      qualityCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** In-memory session over arbitrary-schema frames. */
  final class DomainCapSession(spark: SparkSession,
      idCol: String, domainCol: String, qualityCol: String, k: Int) {
    @volatile private var state: Option[DataFrame] = None

    /** Retained rows WITHOUT ranks. */
    def retainedRows: Option[DataFrame] = state

    /** The retained set with the batch operator's `rk` column. */
    def currentRetention: Option[DataFrame] =
      state.map(s => CurationOps.domainCapRetention(s, idCol, domainCol, qualityCol, k))

    def ingest(batch: DataFrame): DataFrame = {
      val merged = state match {
        case None => pruneTopK(batch, idCol, domainCol, qualityCol, k)
        case Some(s) =>
          pruneTopK(s.union(batch.select(s.columns.map(col).toSeq: _*))
              .dropDuplicates(domainCol, idCol),
            idCol, domainCol, qualityCol, k)
      }
      val pinned = merged.localCheckpoint()
      state = Some(pinned)
      CurationOps.domainCapRetention(pinned, idCol, domainCol, qualityCol, k)
    }

    def start(docs: DataFrame)(sink: (DataFrame, Long) => Unit): StreamingQuery =
      docs.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          sink(ingest(batch), batchId)
        }
        .start()
  }

  /** Durable session over `(doc_id, domain, quality)` rows. */
  final class DurableDomainCapSession(spark: SparkSession, ledgerPath: String,
      k: Int, compactEvery: Int = 0) {

    private val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("domain", StringType),
      StructField("quality", LongType)))

    /** Committed candidate rows (concat of per-batch top-k's). */
    def candidates: DataFrame = DurableLedger.load(spark, ledgerPath, schema)

    /** The retained set with ranks. */
    def currentRetention: DataFrame =
      CurationOps.domainCapRetention(
        candidates.dropDuplicates("domain", "doc_id"),
        "doc_id", "domain", "quality", k)

    def ingest(batch: DataFrame, batchId: Long): DataFrame = {
      val pruned = pruneTopK(
        batch.select(col("doc_id").cast("long").as("doc_id"),
          col("domain").cast("string").as("domain"),
          col("quality").cast("long").as("quality")),
        "doc_id", "domain", "quality", k)
      DurableLedger.commit(pruned, ledgerPath, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, ledgerPath, schema, compactEvery)
      currentRetention
    }

    def start(docs: DataFrame, checkpointLocation: Option[String] = None)(
        sink: (DataFrame, Long) => Unit): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) =>
          sink(ingest(batch, batchId), batchId)
        }
        .start()
    }
  }
}
