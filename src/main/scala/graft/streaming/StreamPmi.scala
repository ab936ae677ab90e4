package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Incrementally-maintained PMI collocation table (q126 as a live
  * panel) — the phrase/compound watch-list a tokenizer-vocabulary or
  * boilerplate pipeline keeps current as the corpus streams in.
  *
  * Exactness by sufficient statistics, the [[StreamKnLm]] argument:
  * PMI is a function of bigram counts `(w1, w2, n)` and unigram counts
  * `(w, nu)`, both ADDITIVE — so merging per-batch deltas and deriving
  * via [[CurationOps.pmiFromCounts]] equals the batch
  * [[CurationOps.pmiCollocations]] over everything ingested EXACTLY
  * (ranking, counts, and the ratio doubles — same integer inputs, same
  * op nest). The durable twin keeps BOTH ledgers under one root
  * (`big/`, `uni/` — the [[StreamKnLm.DurableKnTrigramLmSession]]
  * two-ledger layout); counts are additive/not idempotent, so replay
  * safety comes from the ledger's overwrite-by-batch-id.
  */
object StreamPmi {

  /** In-memory session: two localCheckpointed count frames. */
  final class PmiSession(spark: SparkSession, textCol: String,
      minCount: Int = 5, k: Int = 30) {
    @volatile private var big: DataFrame = null
    @volatile private var uni: DataFrame = null

    /** Current `(bigram, unigram)` count state (null before ingest). */
    def currentCounts: (DataFrame, DataFrame) = (big, uni)

    /** The PMI table as of the last ingest. */
    def currentPmi: DataFrame = {
      require(big != null, "PMI requested before any ingest")
      CurationOps.pmiFromCounts(big, uni, minCount, k)
    }

    def ingest(batch: DataFrame): Unit = {
      val db = CurationOps.bigramCounts(batch, textCol)
      val du = CurationOps.unigramCounts(batch, textCol)
      big = (if (big == null) db else StreamKnLm.mergeCounts(big, db))
        .localCheckpoint()
      uni = (if (uni == null) du
             else uni.union(du).groupBy(col("w")).agg(sum(col("nu")).as("nu")))
        .localCheckpoint()
    }

    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private val BigSchema = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("n", LongType)))
  private val UniSchema = StructType(Seq(
    StructField("w", StringType), StructField("nu", LongType)))

  /** Durable session: per-batch count deltas in two ledgers under
    * `path` (`big/`, `uni/`), sum-folded at read; compactable freely.
    */
  final class DurablePmiSession(spark: SparkSession, path: String,
      textCol: String, minCount: Int = 5, k: Int = 30, compactEvery: Int = 0) {

    private val bigPath = s"$path/big"
    private val uniPath = s"$path/uni"

    def currentBigCounts: DataFrame =
      DurableLedger.load(spark, bigPath, BigSchema)
        .groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("n"))

    def currentUniCounts: DataFrame =
      DurableLedger.load(spark, uniPath, UniSchema)
        .groupBy(col("w")).agg(sum(col("nu")).as("nu"))

    def currentPmi: DataFrame =
      CurationOps.pmiFromCounts(
        currentBigCounts.localCheckpoint(), currentUniCounts.localCheckpoint(),
        minCount, k)

    /** Commit one batch's OWN deltas to both ledgers (replay-safe:
      * redelivery overwrites the batch's directories with identical
      * rows).
      */
    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(CurationOps.bigramCounts(batch, textCol),
        bigPath, batchId)
      DurableLedger.commit(CurationOps.unigramCounts(batch, textCol),
        uniPath, batchId)
      if (compactEvery > 0) {
        DurableLedger.maybeCompact(spark, bigPath, BigSchema, compactEvery)
        DurableLedger.maybeCompact(spark, uniPath, UniSchema, compactEvery)
      }
    }

    def start(docs: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }
}
