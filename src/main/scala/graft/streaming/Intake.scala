package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** S4/T29 analog — the queue-shaped intake as Structured Streaming.
  *
  * The reference's SQS loops (long-poll one message, process, delete on
  * success — `extract_queue_util.py:22-95`, `new_extract_queue_bot.py:136-209`)
  * provide at-least-once delivery with idempotency from keyed upserts.
  * The Spark equivalent: any streaming source → `foreachBatch` → an
  * idempotent MERGE keyed on the item id. Receipt-handle semantics
  * disappear; exactly-once lands on the sink key instead
  * (SURVEY.md §2.3 "Streaming": no watermarks/event-time state needed
  * for parity — each message is independent).
  *
  * [[windowedEventStats]] additionally shows the engine's event-time
  * path (watermark + tumbling window) for stream analytics beyond the
  * reference's surface.
  */
object Intake {

  /** An extract-queue item (reference `to_extract_item.py:8-27`). */
  final case class IntakeItem(etld1: String, batch: String, enqueued_at: java.sql.Timestamp)

  /** Run the intake: every micro-batch is deduplicated against the
    * existing frontier parquet by key and appended insert-only — the
    * MERGE shape of `Ledger.upsertRequests`, restated for streams.
    * At-least-once source + insert-only-by-key sink = effectively-once.
    *
    * The frontier is laid out partitioned by a hash bucket of the key
    * (`bucket = xxhash64(etld1) mod nBuckets`), and each micro-batch
    * anti-joins only against the buckets its own keys fall in —
    * partition pruning on the read path. Without this, every trigger
    * re-scanned the WHOLE frontier: fine locally, a full-table read per
    * micro-batch at a 100 TB frontier. With bucketing, the per-trigger
    * read is proportional to the batch's bucket coverage (≤ nBuckets
    * directories, typically far fewer for small batches). The
    * production analog is Delta `MERGE INTO` over the same bucketed
    * layout.
    */
  def runIntake(
      items: Dataset[IntakeItem],
      frontierPath: String,
      checkpointPath: String,
      nBuckets: Int = 256): StreamingQuery = {
    items.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[IntakeItem], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val withBucket = batch.toDF()
          .dropDuplicates("etld1") // within-batch redelivery
          .withColumn("bucket", pmod(xxhash64(col("etld1")), lit(nBuckets.toLong)))
          .persist() // feeds the touched-bucket collect AND the write
        try {
          // ≤ nBuckets distinct values — a driver-side list for the
          // partition-pruning filter
          val touched = withBucket.select($"bucket").distinct().as[Long].collect()
          // missing frontier → empty; a frontier written by the
          // pre-bucketing layout (no `bucket` column) → full-scan
          // anti-join and KEEP the flat layout (mixing bucket= dirs
          // into a flat frontier would break partition discovery).
          // Any other read failure must FAIL the batch: falling back
          // to empty would skip the anti-join and append duplicates.
          val (existing: DataFrame, bucketed: Boolean) =
            try {
              val f = spark.read.parquet(frontierPath)
              if (f.columns.contains("bucket"))
                (f.filter(col("bucket").isin(touched: _*)) // prunes to touched dirs
                  .select("etld1"), true)
              else (f.select("etld1"), false)
            } catch {
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" =>
                (spark.emptyDataFrame.withColumn("etld1", lit("")), true)
            }
          val fresh = withBucket
            .join(existing, Seq("etld1"), "left_anti") // across-batch idempotency
          if (bucketed)
            fresh.write.mode("append").partitionBy("bucket").parquet(frontierPath)
          else
            fresh.drop("bucket").write.mode("append").parquet(frontierPath)
        } finally withBucket.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Event-time tumbling-window stats with a watermark: late events
    * beyond the watermark are dropped, state is bounded.
    */
  def windowedEventStats(
      events: DataFrame,
      tsCol: String,
      watermark: String = "10 minutes",
      window: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
}
