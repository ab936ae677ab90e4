package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Streaming twin of [[CurationOps.stratifiedSample]] (q32) — a
  * maintained deterministic k-per-stratum sample over a document
  * stream.
  *
  * The batch operator keeps each stratum's k smallest salted md5 ranks
  * — a BOTTOM-K sketch, which is mergeable: the bottom-k of a union is
  * the bottom-k of the concatenated bottom-k's. So the stream state is
  * just the current sample itself (k·|strata| rows — control-plane
  * sized), every batch folds in associatively, and the maintained
  * sample is BIT-IDENTICAL to running the batch operator over
  * everything ingested (spec-pinned, rank column included). The md5
  * key depends only on (salt, id), so redelivered rows collapse in the
  * distinct and the fold is replay-idempotent.
  *
  * This is how a training-mix curator keeps a live balanced sample
  * (per-language eval hold-outs, inspection panels) without ever
  * re-scanning the corpus: per batch the work is the batch's OWN
  * rank-prune plus a merge over bounded state.
  *
  * [[DurableSampleSession]] commits each batch's PRUNED candidates
  * (its own per-stratum bottom-k — only rows that could ever enter the
  * merged sample) to a [[DurableLedger]]; read folds directories by
  * concat → distinct → global rank, so compaction never changes the
  * sample, replay overwrites the same directory, and a restart resumes
  * exactly. Durable rows are `(doc_id, stratum, text)`-shaped like the
  * other durable document sessions.
  */
object StreamSample {

  /** Rank-prune `df` to each stratum's bottom-k by the batch
    * operator's exact key (shared formula — `md5(salt || id)`).
    */
  private def pruneTopK(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, salt: String): DataFrame = {
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** In-memory session over arbitrary-schema frames: `ingest` folds a
    * batch, `currentSample` is the batch operator's output (with `rk`)
    * over everything ingested.
    */
  final class SampleSession(spark: SparkSession,
      idCol: String, stratumCol: String, k: Int, salt: String) {
    @volatile private var state: Option[DataFrame] = None

    /** The maintained sample WITHOUT ranks (state rows). */
    def sampleRows: Option[DataFrame] = state

    /** The maintained sample with the batch operator's `rk` column. */
    def currentSample: Option[DataFrame] =
      state.map(s => CurationOps.stratifiedSample(s, idCol, stratumCol, k, salt))

    def ingest(batch: DataFrame): DataFrame = {
      val merged = state match {
        case None => pruneTopK(batch, idCol, stratumCol, k, salt)
        case Some(s) =>
          pruneTopK(s.union(batch.select(s.columns.map(col).toSeq: _*))
              .dropDuplicates(stratumCol, idCol),
            idCol, stratumCol, k, salt)
      }
      val pinned = merged.localCheckpoint()
      state = Some(pinned)
      CurationOps.stratifiedSample(pinned, idCol, stratumCol, k, salt)
    }

    def start(docs: DataFrame)(sink: (DataFrame, Long) => Unit): StreamingQuery =
      docs.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          sink(ingest(batch), batchId)
        }
        .start()
  }

  /** Durable session over `(doc_id, stratum, text)` rows. */
  final class DurableSampleSession(spark: SparkSession, ledgerPath: String,
      k: Int, salt: String, compactEvery: Int = 0) {

    private val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("stratum", StringType),
      StructField("text", StringType)))

    /** The committed candidate rows (concat of per-batch bottom-k's). */
    def candidates: DataFrame = DurableLedger.load(spark, ledgerPath, schema)

    /** The maintained sample with ranks — the batch operator over the
      * folded, deduplicated candidates.
      */
    def currentSample: DataFrame =
      CurationOps.stratifiedSample(
        candidates.dropDuplicates("stratum", "doc_id"),
        "doc_id", "stratum", k, salt)

    def ingest(batch: DataFrame, batchId: Long): DataFrame = {
      val pruned = pruneTopK(
        batch.select(col("doc_id").cast("long").as("doc_id"),
          col("stratum").cast("string").as("stratum"),
          col("text").cast("string").as("text")),
        "doc_id", "stratum", k, salt)
      DurableLedger.commit(pruned, ledgerPath, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, ledgerPath, schema, compactEvery)
      currentSample
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
