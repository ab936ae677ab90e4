package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sketch.QDigest

/** Incrementally-maintained q-digest (q155/q156 live) — the
  * percentile panel a pipeline watches while a corpus streams in
  * (doc-length drift is the first symptom of a scraper regression).
  *
  * Exactness by sufficient statistics, the strongest form available
  * for this sketch: the maintained state is the LEAF HISTOGRAM
  * (universe-bounded, ≤ 2^L keys — additive, so per-batch deltas merge
  * by sum), and the digest derives from it on read. That makes the
  * streamed digest EQUAL to the batch build over everything ingested —
  * bit-for-bit, not merely within the merge-error envelope that
  * digest-level folding ([[QDigest.merge]]) would give. State is the
  * universe size, not the corpus; a digest-level-state variant saves
  * nothing here because the histogram is already the smaller object.
  */
object StreamQDigest {

  /** Per-batch clamped leaf deltas `(v, cnt)`. */
  def leafDeltas(batch: DataFrame, valueCol: Column, logU: Int): DataFrame = {
    val u = 1L << logU
    batch
      .select(greatest(least(valueCol.cast("long"), lit(u - 1)), lit(0L)).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
  }

  private def digestFrom(spark: SparkSession, counts: DataFrame, logU: Int,
      k: Int): DataFrame = {
    import spark.implicits._
    val u = 1L << logU
    val leaves = counts.collect()
      .map(r => (u + r.getLong(0)) -> r.getLong(1)).toMap
    QDigest.compress(leaves, logU, k).toSeq.map { case (id, cnt) =>
      val (lo, hi) = QDigest.rangeOf(id, logU)
      (id, lo, hi, cnt)
    }.sortBy(_._1).toDF("id", "lo", "hi", "cnt")
  }

  /** In-memory session: one localCheckpointed histogram frame. */
  final class QDigestSession(spark: SparkSession, valueCol: Column,
      logU: Int, k: Int) {
    @volatile private var counts: DataFrame = null

    def currentCounts: DataFrame = counts

    /** The digest as of the last ingest — ≡ the batch
      * [[QDigest.digestTable]] over everything ingested.
      */
    def currentDigest: DataFrame = {
      require(counts != null, "digest requested before any ingest")
      digestFrom(spark, counts, logU, k)
    }

    def ingest(batch: DataFrame): Unit = {
      val delta = leafDeltas(batch, valueCol, logU)
      counts = (if (counts == null) delta else mergeCounts(counts, delta))
        .localCheckpoint()
    }

    def start(rows: DataFrame): StreamingQuery =
      rows.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private[streaming] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("v")).agg(sum(col("cnt")).as("cnt"))

  /** Per-batch clamped (group, leaf) deltas — the grouped session's
    * additive state unit.
    */
  def groupedLeafDeltas(batch: DataFrame, groupCol: Column,
      valueCol: Column, logU: Int): DataFrame = {
    val u = 1L << logU
    batch
      .select(groupCol.cast("string").as("g"),
        greatest(least(valueCol.cast("long"), lit(u - 1)), lit(0L)).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
  }

  /** Grouped (per-host) session — q160 live: the state is the
    * (group, leaf) histogram (additive, so per-batch deltas merge by
    * sum; size ≤ hosts × 2^L keys and the DERIVATION never collects —
    * [[graft.sketch.QDigest.digestsFromGroupCounts]] compresses each
    * group where it sits). Streamed ≡ the batch
    * [[graft.sketch.QDigest.digestByGroup]] bit-for-bit, same
    * sufficient-statistics argument as the flat session, and the SAME
    * shared derivation code path.
    */
  final class GroupedQDigestSession(spark: SparkSession, groupCol: Column,
      valueCol: Column, logU: Int, k: Int) {
    @volatile private var counts: DataFrame = null

    def currentCounts: DataFrame = counts

    /** One digest per group ingested so far — ≡ the batch
      * [[graft.sketch.QDigest.digestByGroup]] over everything.
      */
    def currentDigests: DataFrame = {
      require(counts != null, "digests requested before any ingest")
      import spark.implicits._
      QDigest.digestsFromGroupCounts(
        counts.as[(String, Long, Long)], logU, k)
    }

    def ingest(batch: DataFrame): Unit = {
      val delta = groupedLeafDeltas(batch, groupCol, valueCol, logU)
      counts = (if (counts == null) delta else mergeGroupCounts(counts, delta))
        .localCheckpoint()
    }

    def start(rows: DataFrame): StreamingQuery =
      rows.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) => ingest(batch) }
        .start()
  }

  private[streaming] def mergeGroupCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("g"), col("v")).agg(sum(col("cnt")).as("cnt"))

  private val CountSchema = StructType(Seq(
    StructField("v", LongType), StructField("cnt", LongType)))

  /** Durable session: per-batch histogram deltas in one sum-foldable
    * ledger; replay-safe by overwrite-by-batch-id, compactable freely.
    */
  final class DurableQDigestSession(spark: SparkSession, path: String,
      valueCol: Column, logU: Int, k: Int, compactEvery: Int = 0) {

    def currentCounts: DataFrame =
      DurableLedger.load(spark, path, CountSchema)
        .groupBy(col("v")).agg(sum(col("cnt")).as("cnt"))

    def currentDigest: DataFrame =
      digestFrom(spark, currentCounts, logU, k)

    def ingest(batch: DataFrame, batchId: Long): Unit = {
      DurableLedger.commit(leafDeltas(batch, valueCol, logU), path, batchId)
      if (compactEvery > 0)
        DurableLedger.maybeCompact(spark, path, CountSchema, compactEvery)
    }

    def start(rows: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
      val w = rows.writeStream.outputMode("append")
      checkpointLocation.foreach(w.option("checkpointLocation", _))
      w.foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
        .start()
    }
  }
}
