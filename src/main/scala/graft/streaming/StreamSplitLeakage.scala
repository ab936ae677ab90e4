package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Incrementally-maintained train/eval split-leakage audit (q147 as a
  * live monitor) — the release gate a continuously-growing corpus
  * wants open all the time: the moment a new crawl batch lands a
  * fingerprint on the other side of a split boundary, the key surfaces
  * without re-auditing the corpus.
  *
  * Exactness by sufficient statistics (the [[StreamPmi]] argument):
  * split assignment is a pure hash of (seed, group), so every batch
  * assigns its own rows identically, and the audit is a function of
  * the per-key per-split counts — ADDITIVE, so merged per-batch
  * [[CurationOps.splitKeyCounts]] deltas + the
  * [[CurationOps.splitLeakageFromCounts]] filter equal the batch
  * [[CurationOps.splitLeakage]] over everything ingested EXACTLY (all
  * columns integer counts; nothing floats). State is keyed by the
  * fingerprint — bounded by DISTINCT keys, the same asymptote the
  * batch op's groupBy shuffles. Counts are additive / NOT idempotent,
  * so the durable twin's replay safety comes from the ledger's
  * overwrite-by-batch-id, and compaction is a free sum-fold.
  */
object StreamSplitLeakage {

  /** In-memory session: one localCheckpointed count frame. */
  final class LeakageSession(spark: SparkSession, idCol: String,
      groupCol: String, keyCol: Column, seed: String,
      trainPct: Int = 80, valPct: Int = 10) {
    @volatile private var counts: DataFrame = null

    /** Current merged (h, n_train, n_val, n_test, n_docs) state. */
    def currentCounts: DataFrame = counts

    /** The leaked-key table as of the last ingest. */
    def currentLeakage: DataFrame = {
      require(counts != null, "leakage requested before any ingest")
      CurationOps.splitLeakageFromCounts(counts)
    }

    def ingest(batch: DataFrame): Unit = {
      val delta = CurationOps.splitKeyCounts(
        batch, idCol, groupCol, keyCol, seed, trainPct, valPct)
      counts = (if (counts == null) delta else mergeCounts(counts, delta))
        .localCheckpoint()
    }

    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private[streaming] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("h")).agg(
      sum(col("n_train")).as("n_train"), sum(col("n_val")).as("n_val"),
      sum(col("n_test")).as("n_test"), sum(col("n_docs")).as("n_docs"))

  private val CountSchema = StructType(Seq(
    StructField("h", StringType),
    StructField("n_train", LongType), StructField("n_val", LongType),
    StructField("n_test", LongType), StructField("n_docs", LongType)))

  /** Durable session: per-batch count deltas in one ledger under
    * `path`, sum-folded at read; compactable freely (sum is
    * associative); restart resumes from disk.
    */
  final class DurableLeakageSession(spark: SparkSession, path: String,
      idCol: String, groupCol: String, keyCol: Column, seed: String,
      trainPct: Int = 80, valPct: Int = 10, compactEvery: Int = 0) {

    def currentCounts: DataFrame =
      DurableLedger.load(spark, path, CountSchema)
        .groupBy(col("h")).agg(
          sum(col("n_train")).as("n_train"), sum(col("n_val")).as("n_val"),
          sum(col("n_test")).as("n_test"), sum(col("n_docs")).as("n_docs"))

    def currentLeakage: DataFrame =
      CurationOps.splitLeakageFromCounts(currentCounts.localCheckpoint())

    /** Commit one batch's OWN deltas (replay-safe: redelivery
      * overwrites the batch's directory with identical rows).
      */
    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(
        CurationOps.splitKeyCounts(
          batch, idCol, groupCol, keyCol, seed, trainPct, valPct),
        path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, CountSchema, compactEvery)
    }

    def start(docs: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }
}
