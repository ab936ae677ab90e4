package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.textops.NearDup

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

  /** A near-dup candidate discovered in the stream; `est_jaccard` is the
    * MinHash estimate (matching signature slots / k) — exact
    * verification happens downstream on the candidate subset, like the
    * batch path.
    */
  final case class NearDupCandidate(id_a: Long, id_b: Long, est_jaccard: Double)

  // not `private`: the encoder's generated SafeProjection must be able
  // to construct it
  final case class BandRow(band_key: String, doc_id: Long,
      sig: Seq[Long], event_ts: java.sql.Timestamp)

  /** Streaming NEAR-dup candidates: the streaming twin of
    * [[graft.textops.NearDup.minhashLshPairs]]. Each document's MinHash
    * signature is banded; band buckets become `flatMapGroupsWithState`
    * keys holding the bucket's recently-seen (doc, signature) list, so
    * an arriving document is compared only against its bucket — never
    * the stream. State is bounded two ways: event-time timeout evicts
    * buckets idle past the horizon (the watermark contract, like
    * [[dedupStream]]), and `maxPerBucket` caps pathological hot buckets
    * (a popular boilerplate bucket keeps its newest members).
    *
    * Emission is at-least-once per pair (two docs can share several
    * bands); the downstream MERGE keyed on (id_a, id_b) absorbs
    * duplicates — same sink contract as the rest of the engine.
    */
  def nearDupStream(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      horizon: String = "1 hour",
      maxPerBucket: Int = 64): Dataset[NearDupCandidate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val params = NearDup.minhashParams(bands * rowsPerBand)
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(iv.months == 0, s"horizon must be day-scale or finer: $horizon")
    val horizonMs = iv.days * 24L * 3600 * 1000 + iv.microseconds / 1000
    val sigUdf = udf((text: String) =>
      NearDup.signatureWith(
        NearDup.wordShingles(Option(text).getOrElse(""), n).map(NearDup.shingleHash60(_)),
        params))
    val bandKeys = transform(sequence(lit(0), lit(bands - 1)),
      j => concat_ws("_", (j +: (0 until rowsPerBand).map(i =>
        element_at(col("__sig"), j * rowsPerBand + i + 1))): _*))
    val banded = stream
      .withWatermark(tsCol, horizon)
      // shingle-less docs (null/empty/short text) carry NO signature,
      // like the batch twin — without this filter their all-MaxValue
      // sentinel signatures would pair every empty doc with every other
      // empty doc at est_jaccard 1.0
      .filter(col(textCol).isNotNull &&
        size(NearDup.shinglesCol(col(textCol), n)) > 0)
      .withColumn("__sig", sigUdf(col(textCol)))
      .select(explode(bandKeys).as("band_key"),
        col(idCol).cast("long").as("doc_id"),
        col("__sig").as("sig"),
        col(tsCol).as("event_ts"))
      .as[BandRow]
    banded
      .groupByKey((r: BandRow) => r.band_key)
      .flatMapGroupsWithState[(Long, List[(Long, Seq[Long])]), NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[BandRow],
            state: GroupState[(Long, List[(Long, Seq[Long])])]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (maxEventMs, seen) = state.getOption
              .getOrElse((Long.MinValue, List.empty[(Long, Seq[Long])]))
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCandidate]
            rows.foreach { r =>
              maxEventMs = math.max(maxEventMs, r.event_ts.getTime)
              seen.foreach { case (oid, osig) =>
                if (oid != r.doc_id) {
                  val k = r.sig.length
                  var eq = 0
                  var i = 0
                  while (i < k) { if (r.sig(i) == osig(i)) eq += 1; i += 1 }
                  out += NearDupCandidate(math.min(oid, r.doc_id),
                    math.max(oid, r.doc_id), eq.toDouble / k)
                }
              }
              seen = ((r.doc_id, r.sig) :: seen.filterNot(_._1 == r.doc_id))
                .take(maxPerBucket)
            }
            state.update((maxEventMs, seen))
            // evict once the watermark passes the bucket's newest-EVER
            // event by the horizon. The max rides in state: using only
            // this batch's max would let a late-but-admitted row move
            // the eviction time BACKWARDS and expire newer members
            // early; using currentWatermark + horizon would expire
            // everything after the first batch (the watermark lags a
            // batch and starts at zero).
            state.setTimeoutTimestamp(maxEventMs + horizonMs)
            out.iterator
          }
      }
  }
}
