package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.textops.CurationOps

/** Incrementally-maintained per-domain cap retention (q110 live — the
  * FineWeb/RefinedWeb "domain budget" held open while the crawl
  * streams): at most k documents per group, best-by-quality with the
  * deterministic (quality desc, id asc) tiebreak.
  *
  * Exactness by the top-k fold law: `topk(A ∪ B) = topk(topk(A) ∪ B)`
  * under a TOTAL order (the id tiebreak makes it one), so the
  * maintained state IS the retained set and folding each batch's own
  * pruned top-k reproduces the batch operator over everything ingested
  * EXACTLY — rank column included (recomputed on the capped set, same
  * order). Eviction is permanent by the same law: once a document
  * falls outside a group's top-k it can never re-enter (later rows
  * only push quality UP), which is what a budget means. State is
  * groups × k rows — the output's own size. Durable twin commits each
  * batch's pruned top-k delta (deterministic per batch → replay-safe
  * by overwrite-by-batch-id); the read-side fold re-caps, so ledger
  * compaction is free.
  */
object StreamDomainCap {

  /** In-memory session over `(id, group, quality)` projections. */
  final class DomainCapSession(spark: SparkSession, idCol: String,
      groupCol: String, qualityCol: String, k: Int) {
    @volatile private var state: DataFrame = null

    /** The retained set with its rank — ≡ the batch
      * [[CurationOps.domainCapRetention]] over everything ingested.
      */
    def currentRetained: DataFrame = {
      require(state != null, "retention requested before any ingest")
      CurationOps.domainCapRetention(state, idCol, groupCol, qualityCol, k)
    }

    def ingest(batch: DataFrame): Unit = {
      val delta = batch.select(col(idCol), col(groupCol), col(qualityCol))
      val merged = if (state == null) delta else state.union(delta)
      state = CurationOps
        .domainCapRetention(merged, idCol, groupCol, qualityCol, k)
        .drop("rk")
        .localCheckpoint()
    }

    def start(docs: DataFrame): StreamingQuery =
      docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  /** Durable session; `idType`/`qualityType` default to the common
    * (long id, double quality) shape — pass a schema for others.
    */
  final class DurableDomainCapSession(spark: SparkSession, path: String,
      idCol: String, groupCol: String, qualityCol: String, k: Int,
      compactEvery: Int = 0) {

    private val schema = StructType(Seq(
      StructField(idCol, LongType), StructField(groupCol, StringType),
      StructField(qualityCol, DoubleType)))

    def currentRetained: DataFrame =
      CurationOps.domainCapRetention(
        DurableLedger.load(spark, path, schema), idCol, groupCol, qualityCol, k)

    /** Commit the batch's OWN pruned top-k (deterministic —
      * redelivery overwrites with identical rows).
      */
    def ingest(batch: DataFrame, batchId: Long): Unit = {
      val pruned = CurationOps.domainCapRetention(
          batch.select(col(idCol), col(groupCol), col(qualityCol)),
          idCol, groupCol, qualityCol, k)
        .drop("rk")
      DurableLedger.commit(pruned, path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, schema, compactEvery)
    }

    def start(docs: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = docs.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }
}
