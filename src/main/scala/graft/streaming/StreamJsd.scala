package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Incrementally-maintained corpus-similarity matrix (q129 as a live
  * panel): the pairwise Jensen-Shannon divergence between per-group
  * (language/source/snapshot) unigram distributions, kept current as
  * the corpus streams in — the panel a mixing policy consults before
  * setting weights, and a drift alarm across EVERY group pair at once
  * (where [[StreamDrift]] watches one new-vs-reference axis).
  *
  * Exactness by sufficient statistics (the [[StreamPmi]] argument):
  * the matrix is a function of per-group word counts `(w, g, n)` —
  * ADDITIVE — so ledger-merged deltas derived through
  * [[CurationOps.jsDivergenceFromCounts]] equal the batch
  * [[CurationOps.jsDivergenceByGroup]] over everything ingested
  * EXACTLY: the per-word pair terms are rounded to micro fixed-point
  * BEFORE the cross-row sum, so even the doubles are reproduced
  * (exact long arithmetic from identical integer inputs).
  *
  * Durable twin: one `(w, g, n)` ledger, per-batch deltas
  * overwrite-by-batch-id (counts are additive, not idempotent),
  * sum-folded at read; compaction preserves the fold.
  */
object StreamJsd {

  /** In-memory session over a fixed group roster. */
  final class JsdSession(spark: SparkSession, groupCol: String,
      textCol: String, groupValues: Seq[String]) {
    @volatile private var cnt: DataFrame = null

    /** Current `(w, g, n)` count state (null before ingest). */
    def currentCounts: DataFrame = cnt

    /** The divergence matrix as of the last ingest. */
    def currentJsd: DataFrame = {
      require(cnt != null, "JSD requested before any ingest")
      CurationOps.jsDivergenceFromCounts(cnt, groupValues)
    }

    def ingest(batch: DataFrame): Unit = {
      val d = CurationOps.groupedUnigramCounts(batch, groupCol, textCol)
      cnt = (if (cnt == null) d
             else cnt.unionByName(d).groupBy(col("w"), col("g"))
               .agg(sum(col("n")).as("n")))
        .localCheckpoint()
    }

    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private val CntSchema = StructType(Seq(
    StructField("w", StringType), StructField("g", StringType),
    StructField("n", LongType)))

  /** Durable session: per-batch `(w, g, n)` deltas under `path`. */
  final class DurableJsdSession(spark: SparkSession, path: String,
      groupCol: String, textCol: String, groupValues: Seq[String],
      compactEvery: Int = 0) {

    def currentCounts: DataFrame =
      DurableLedger.load(spark, path, CntSchema)
        .groupBy(col("w"), col("g")).agg(sum(col("n")).as("n"))

    def currentJsd: DataFrame =
      CurationOps.jsDivergenceFromCounts(
        currentCounts.localCheckpoint(), groupValues)

    /** Commit one batch's OWN deltas (replay-safe: redelivery
      * overwrites the batch directory with identical rows). */
    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(
        CurationOps.groupedUnigramCounts(batch, groupCol, textCol),
        path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, CntSchema, compactEvery)
    }

    def start(docs: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }
}
