package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.textops.CurationOps

/** Streaming twin of [[graft.textops.CurationOps.winnowedSpanDedup]]
  * — cross-document SPAN dedup for a document stream. The batch
  * operator's chunking is content-defined per document (no
  * cross-document dependency), so the only global state a stream
  * needs is the seen-fingerprint LEDGER: the distinct chunk hashes of
  * everything already admitted.
  *
  * Per micro-batch ([[SpanDedupSession]], the
  * [[StreamContamination.runScoring]] foreachBatch shape):
  *
  *  1. chunk the batch with the EXACT batch operator's phase
  *     (`CurationOps.winnowedChunks` — shared code, not a mirror);
  *  2. a chunk is dropped iff its hash is in the ledger (admitted by
  *     an earlier batch — first-arrival-wins) OR an identical chunk
  *     sits earlier within this batch (the batch operator's
  *     min(struct) first-occurrence, batch-scoped);
  *  3. rebuild per-doc kept text with the shared rebuild;
  *  4. merge the batch's chunk hashes into the ledger
  *     (union-distinct: associative AND replay-idempotent, the
  *     [[StreamContamination.mergeBenchmark]] contract — a
  *     redelivered batch drops everything and grows nothing).
  *
  * A single batch against an empty ledger IS the batch operator,
  * column for column (spec-pinned); across batches the kept chunks
  * are globally unique and every drop has an earlier-admitted
  * occurrence (spec-pinned invariants).
  *
  * Scale shape: the ledger is the classic dedup ledger — corpus-scale
  * but hash-only, held DISTRIBUTED (localCheckpointed frame here,
  * which re-shuffles the ledger through the merge's distinct each
  * batch — fine for session-scale streams; a production deployment
  * keys it in a Delta/parquet table and MERGEs only the batch's
  * hashes, the [[graft.plans.Ledger]] seam, making the per-batch cost
  * proportional to the BATCH, not the corpus). The probe join and the
  * batch-local first-occurrence aggregate shuffle only the batch's
  * own chunks either way.
  */
object StreamSpanDedup {

  /** An empty seen-fingerprint ledger (`__ch: string`). */
  def emptyLedger(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF("__ch")
  }

  /** Dedup one batch frame against the ledger. Returns the per-doc
    * result (batch-operator columns) and the UPDATED ledger.
    */
  def spanDedupBatch(batch: DataFrame, ledger: DataFrame,
      idCol: String, textCol: String,
      shingleWords: Int, winnowRadius: Int): (DataFrame, DataFrame) = {
    // two consumers (flagging + ledger merge) — checkpoint so the
    // window/agg chunking runs once
    val chunks = CurationOps.winnowedChunks(
      batch, idCol, textCol, shingleWords, winnowRadius).localCheckpoint()
    val firsts = chunks
      .groupBy(col("__ch"))
      .agg(min(struct(col(idCol).as("fid"), col("cid").as("fidx"))).as("__first"))
    val flagged = chunks
      .join(firsts, "__ch")
      .join(ledger.withColumn("__seen", lit(1)).distinct(), Seq("__ch"), "left")
      .withColumn("__keep",
        col("__seen").isNull &&
          col(idCol) === col("__first.fid") && col("cid") === col("__first.fidx"))
    val out = CurationOps.rebuildKept(flagged, idCol)
    val newLedger = ledger.union(chunks.select(col("__ch")))
      .distinct().localCheckpoint()
    (out, newLedger)
  }

  /** A running span-dedup session over a document stream: foreachBatch
    * threads the ledger across micro-batches; `sink` receives each
    * batch's per-doc result (materialize it inside the sink — the
    * ledger advances after the sink returns).
    */
  final class SpanDedupSession(spark: SparkSession,
      idCol: String, textCol: String, shingleWords: Int, winnowRadius: Int,
      initial: Option[DataFrame] = None) {
    @volatile private var state: DataFrame = initial.getOrElse(emptyLedger(spark))

    /** The current ledger (hash-only frame). */
    def ledger: DataFrame = state

    def start(docs: DataFrame)(sink: (DataFrame, Long) => Unit): StreamingQuery =
      docs.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val (out, next) = spanDedupBatch(
            batch, state, idCol, textCol, shingleWords, winnowRadius)
          sink(out, batchId)
          state = next
        }
        .start()
  }
}
