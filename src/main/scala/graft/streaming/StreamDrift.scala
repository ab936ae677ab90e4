package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Incrementally-maintained corpus-drift monitor (q127 as a live
  * panel): the chi-square "what changed vs the reference crawl" table,
  * kept current as the NEW crawl streams in — the drift alarm a
  * curation pipeline watches to catch a scraper regression or a
  * topical shift before it pollutes a training mix.
  *
  * Exactness by sufficient statistics (the [[StreamPmi]] argument):
  * the drift table is a function of per-side word counts `(w, na, nb)`
  * — ADDITIVE — so merging per-batch deltas of the streaming side
  * against the fixed reference side and deriving via
  * [[CurationOps.corpusDriftFromCounts]] equals the batch
  * [[CurationOps.corpusDrift]] over (reference, everything-ingested)
  * EXACTLY, chi-square doubles included: same integer count inputs,
  * same fixed per-row op nest, no cross-row float accumulation.
  *
  * The durable twin keeps the reference side's counts in a `ref/`
  * ledger (seeded once at first construction) and the streaming side's
  * per-batch deltas in `new/` — counts are additive/not idempotent, so
  * replay safety comes from the ledger's overwrite-by-batch-id; both
  * ledgers compact freely (sum-fold preserving).
  */
object StreamDrift {

  private def refCountsOf(ref: DataFrame, textCol: String): DataFrame =
    CurationOps.unigramCounts(ref, textCol)
      .select(col("w"), col("nu").as("na"))

  private def mergedCounts(refCnt: DataFrame, newCnt: DataFrame): DataFrame =
    refCnt.select(col("w"), col("na"), lit(0L).as("nb"))
      .unionByName(newCnt.select(col("w"), lit(0L).as("na"), col("nb")))
      .groupBy(col("w"))
      .agg(sum(col("na")).as("na"), sum(col("nb")).as("nb"))

  /** In-memory session: the reference corpus's counts are fixed at
    * construction; each ingested batch folds its word counts into the
    * streaming side.
    */
  final class DriftSession(spark: SparkSession, ref: DataFrame,
      textCol: String, minTotal: Long = 10, k: Int = 30) {
    private val refCnt = refCountsOf(ref, textCol).localCheckpoint()
    @volatile private var newCnt: DataFrame = null

    /** Current `(reference, streaming)` count state (`null` streaming
      * side before any ingest). */
    def currentCounts: (DataFrame, DataFrame) = (refCnt, newCnt)

    /** The drift table as of the last ingest. */
    def currentDrift: DataFrame = {
      require(newCnt != null, "drift requested before any ingest")
      CurationOps.corpusDriftFromCounts(mergedCounts(refCnt, newCnt),
        minTotal, k)
    }

    def ingest(batch: DataFrame): Unit = {
      val d = CurationOps.unigramCounts(batch, textCol)
        .select(col("w"), col("nu").as("nb"))
      newCnt = (if (newCnt == null) d
                else newCnt.unionByName(d).groupBy(col("w"))
                  .agg(sum(col("nb")).as("nb")))
        .localCheckpoint()
    }

    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private val RefSchema = StructType(Seq(
    StructField("w", StringType), StructField("na", LongType)))
  private val NewSchema = StructType(Seq(
    StructField("w", StringType), StructField("nb", LongType)))

  /** Durable session over `path` (`ref/` + `new/` ledgers). The
    * reference side is seeded ONCE — a restart over an already-seeded
    * root ignores the constructor's `ref` frame and reads the ledger,
    * so the monitor's baseline is stable across sessions by
    * construction.
    */
  final class DurableDriftSession(spark: SparkSession, path: String,
      ref: => DataFrame, textCol: String, minTotal: Long = 10, k: Int = 30,
      compactEvery: Int = 0) {

    private val refPath = s"$path/ref"
    private val newPath = s"$path/new"

    if (DurableLedger.batches(refPath).isEmpty)
      DurableLedger.commit(refCountsOf(ref, textCol), refPath, 0L)

    def currentRefCounts: DataFrame =
      DurableLedger.load(spark, refPath, RefSchema)
        .groupBy(col("w")).agg(sum(col("na")).as("na"))

    def currentNewCounts: DataFrame =
      DurableLedger.load(spark, newPath, NewSchema)
        .groupBy(col("w")).agg(sum(col("nb")).as("nb"))

    def currentDrift: DataFrame =
      CurationOps.corpusDriftFromCounts(
        mergedCounts(currentRefCounts.localCheckpoint(),
          currentNewCounts.localCheckpoint()),
        minTotal, k)

    /** Commit one batch's OWN word-count deltas (replay-safe:
      * redelivery overwrites the batch directory with identical rows).
      */
    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(
        CurationOps.unigramCounts(batch, textCol)
          .select(col("w"), col("nu").as("nb")),
        newPath, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, newPath, NewSchema, compactEvery)
    }

    def start(docs: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }
}
