package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup for continuous ingestion (training-data
  * pipeline: drop repeated documents as they arrive — the streaming
  * twin of the batch hash-groupBy). One occurrence survives per
  * content hash; across micro-batches the earlier batch's survivor
  * wins, while WITHIN a micro-batch the survivor is arbitrary (Spark
  * gives no intra-batch ordering — callers needing strict
  * first-by-event-time semantics aggregate per key downstream).
  *
  * `dropDuplicatesWithinWatermark` keys the state store on the content
  * hash and expires state past the watermark, so memory is bounded by
  * the dedup horizon instead of the stream's lifetime — the only
  * correct shape for an unbounded 100 TB/day feed.
  */
object StreamDedup {

  /** Deduplicate a streaming DataFrame by content hash of `textCol`
    * within the watermark horizon. Input must carry an event-time
    * column `tsCol`.
    */
  def dedupStream(stream: DataFrame, textCol: String, tsCol: String,
      horizon: String = "1 hour"): DataFrame =
    stream
      .withColumn("__content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
