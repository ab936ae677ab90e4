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
    val (out, fresh) = spanDedupBatchWithFresh(
      batch, ledger, idCol, textCol, shingleWords, winnowRadius)
    val newLedger = ledger.union(fresh).distinct().localCheckpoint()
    (out, newLedger)
  }

  /** The batch core: per-doc result plus the batch's FRESH hashes
    * (distinct chunk hashes NOT already in the ledger — exactly what a
    * durable ledger appends per batch; [[spanDedupBatch]] unions them
    * into the in-memory frame instead).
    */
  def spanDedupBatchWithFresh(batch: DataFrame, ledger: DataFrame,
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
    val fresh = chunks.select(col("__ch")).distinct()
      .join(ledger.distinct(), Seq("__ch"), "left_anti")
    (out, fresh)
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

  /** [[SpanDedupSession]] with the ledger in a [[DurableLedger]]
    * parquet table instead of driver memory: the session survives a
    * process RESTART (resume with the same `ledgerPath` + streaming
    * `checkpointLocation` — spans admitted before the crash stay
    * admitted), and a replayed micro-batch recommits the identical
    * fresh-hash set to its own directory (the ledger is exactly-once;
    * the per-doc `sink` is the usual foreachBatch at-least-once).
    * Per-batch cost is proportional to the BATCH — one anti-join probe
    * against the ledger and one O(batch) append, never an O(corpus)
    * rewrite.
    */
  /** `compactEvery > 0` auto-folds the ledger's batch directories via
    * [[DurableLedger.maybeCompact]] whenever the live count reaches it
    * (the end-of-ingest maintenance turn; the in-flight batch is the
    * newest and is never folded, so replay safety is untouched).
    */
  final class DurableSpanDedupSession(spark: SparkSession, ledgerPath: String,
      idCol: String, textCol: String, shingleWords: Int, winnowRadius: Int,
      compactEvery: Int = 0) {

    private val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__ch",
        org.apache.spark.sql.types.StringType)))

    /** The committed ledger (hash-only frame, read from disk). */
    def ledger: DataFrame = DurableLedger.load(spark, ledgerPath, schema)

    /** One micro-batch against the durable ledger: dedup vs everything
      * committed EXCEPT this batch id (replay safety), commit the fresh
      * hashes, return the per-doc result. Public so batch bootstraps
      * can load an initial corpus through the same path.
      */
    def ingest(batch: DataFrame, batchId: Long): DataFrame = {
      val prior = DurableLedger.load(spark, ledgerPath, schema,
        excludeBatch = Some(batchId))
      val (out, fresh) = spanDedupBatchWithFresh(
        batch, prior, idCol, textCol, shingleWords, winnowRadius)
      // materialize the result BEFORE the commit so the sink's frame
      // doesn't observe its own batch's directory through `prior`
      val pinned = out.localCheckpoint()
      DurableLedger.commit(fresh, ledgerPath, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, ledgerPath, schema, compactEvery)
      pinned
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
