package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.textops.CurationOps

/** Streaming twin of [[CurationOps.cdcDedupStats]] (q133) — block-level
  * dedup accounting as a MAINTAINED session: a live crawl wants each
  * micro-batch's "how many of these content-defined blocks are new
  * work" panel (the q134 incremental-re-process question) without
  * recomputing the corpus, and the only global state that requires is
  * the seen-block ledger: the distinct chunk md5s of everything already
  * ingested — block hashes are per-row facts, so the
  * [[StreamSpanDedup]] admission-ledger pattern applies verbatim.
  *
  * Per micro-batch ([[cdcDedupBatch]]):
  *
  *  1. chunk the batch with the EXACT batch operator's phase
  *     ([[CurationOps.cdcSegments]] — shared code, not a mirror);
  *  2. a chunk is a DUPLICATE iff its md5 is in the ledger (ingested
  *     by an earlier batch — first-arrival-wins) OR an identical chunk
  *     sits earlier within this batch by `(doc, chunk_idx)` (the batch
  *     operator's min-struct first occurrence, batch-scoped);
  *  3. roll up per document: `n_chunks`, `n_dup_chunks`, `dup_words`
  *     — the batch operator's exact output columns;
  *  4. merge the batch's fresh md5s into the ledger (union-distinct:
  *     associative AND replay-idempotent — a redelivered batch
  *     reports every block as duplicated-or-first exactly as before
  *     and grows nothing... see the redelivery note below).
  *
  * A single batch against an empty ledger IS `cdcDedupStats(batch)`
  * column for column, and a stream of ascending-id batches equals the
  * batch operator under ANY split points (spec-pinned): the global
  * min-struct occurrence lands in the earliest batch containing its
  * md5 and is that batch's own minimum, so every chunk's flag agrees.
  *
  * Scale shape: the ledger is hash-only (md5 strings, never text);
  * per-batch work is one probe join + one O(batch) append through the
  * [[DurableLedger]] seam — never an O(corpus) rewrite. Boundaries
  * are content-defined, so a shifted edit between snapshots leaves
  * downstream block hashes (and their ledger hits) intact — the whole
  * point of CDC accounting on a re-crawl.
  */
object StreamCdcDedup {

  /** An empty seen-block ledger (`chunk_md5: string`). */
  def emptyLedger(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF("chunk_md5")
  }

  /** One batch against the ledger: per-doc stats (the batch operator's
    * columns) plus the updated ledger.
    */
  def cdcDedupBatch(batch: DataFrame, ledger: DataFrame,
      idCol: String, textCol: String,
      window: Int = 3, mask: Int = 7): (DataFrame, DataFrame) = {
    val (out, fresh) = cdcDedupBatchWithFresh(
      batch, ledger, idCol, textCol, window, mask)
    val newLedger = ledger.union(fresh).distinct().localCheckpoint()
    (out, newLedger)
  }

  /** The batch core: per-doc stats plus the batch's FRESH md5s
    * (distinct block hashes not already in the ledger — exactly what a
    * durable ledger appends per batch).
    */
  def cdcDedupBatchWithFresh(batch: DataFrame, ledger: DataFrame,
      idCol: String, textCol: String,
      window: Int, mask: Int): (DataFrame, DataFrame) = {
    // two consumers (flagging + ledger merge) — checkpoint so the
    // per-doc HOF chunking runs once
    val chunks = CurationOps.cdcSegments(batch, idCol, textCol, window, mask)
      .localCheckpoint()
    val firsts = chunks.groupBy(col("chunk_md5"))
      .agg(min(struct(col(idCol).as("fid"), col("chunk_idx").as("fidx")))
        .as("__first"))
    val flagged = chunks
      .join(firsts, "chunk_md5")
      .join(ledger.withColumn("__seen", lit(1)).distinct(),
        Seq("chunk_md5"), "left")
      .withColumn("__dup",
        col("__seen").isNotNull ||
          col(idCol) =!= col("__first.fid") ||
          col("chunk_idx") =!= col("__first.fidx"))
    val out = flagged.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__dup"), lit(1L)).otherwise(lit(0L))).as("n_dup_chunks"),
        sum(when(col("__dup"), col("n_words")).otherwise(lit(0L))).as("dup_words"))
    val fresh = chunks.select(col("chunk_md5")).distinct()
      .join(ledger.distinct(), Seq("chunk_md5"), "left_anti")
    (out, fresh)
  }

  /** A running CDC-accounting session: foreachBatch threads the ledger
    * across micro-batches; `sink` receives each batch's per-doc stats.
    */
  final class CdcDedupSession(spark: SparkSession,
      idCol: String, textCol: String, window: Int = 3, mask: Int = 7,
      initial: Option[DataFrame] = None) {
    @volatile private var state: DataFrame = initial.getOrElse(emptyLedger(spark))

    /** The current seen-block ledger (hash-only frame). */
    def ledger: DataFrame = state

    def start(docs: DataFrame)(sink: (DataFrame, Long) => Unit): StreamingQuery =
      docs.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val (out, next) = cdcDedupBatch(batch, state, idCol, textCol, window, mask)
          sink(out, batchId)
          state = next
        }
        .start()
  }

  /** [[CdcDedupSession]] with the ledger in a [[DurableLedger]] parquet
    * table: the session survives a process restart (same `ledgerPath`
    * + streaming `checkpointLocation` — blocks ingested before the
    * crash stay attributed), and a replayed micro-batch reads the
    * ledger EXCLUDING its own directory, so it reports the identical
    * stats and recommits the identical fresh set (exactly-once ledger;
    * the per-doc `sink` is the usual foreachBatch at-least-once).
    * `compactEvery > 0` folds batch directories at the maintenance
    * turn ([[DurableLedger.maybeCompact]] — the newest id is never
    * folded, so replay safety is untouched).
    */
  final class DurableCdcDedupSession(spark: SparkSession, ledgerPath: String,
      idCol: String, textCol: String, window: Int = 3, mask: Int = 7,
      compactEvery: Int = 0) {

    private val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_md5",
        org.apache.spark.sql.types.StringType)))

    /** The committed ledger (hash-only frame, read from disk). */
    def ledger: DataFrame = DurableLedger.load(spark, ledgerPath, schema)

    /** One micro-batch against the durable ledger (public so batch
      * bootstraps can load an initial corpus through the same path).
      */
    def ingest(batch: DataFrame, batchId: Long): DataFrame = {
      val prior = DurableLedger.load(spark, ledgerPath, schema,
        excludeBatch = Some(batchId))
      val (out, fresh) = cdcDedupBatchWithFresh(
        batch, prior, idCol, textCol, window, mask)
      // materialize BEFORE the commit so the result doesn't observe
      // its own batch's directory through `prior`
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
