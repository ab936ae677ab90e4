package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.textops.{CurationOps, TextTokens}

/** Streaming twin of [[graft.textops.CurationOps.perplexityBuckets]] —
  * CCNet-style head/middle/tail labeling for a document stream.
  *
  * The batch operator's bucket boundaries are GLOBAL statistics twice
  * over: per-token surprisal comes from corpus-wide unigram counts,
  * and the head/middle cuts are exact-integer thirds of the corpus's
  * cumulative token mass. A stream cannot hold either exactly — and
  * CCNet itself doesn't try: the language model is trained OFFLINE on
  * a reference corpus (Wikipedia) and applied to the crawl (Wenzek et
  * al. 2020). The twin mirrors that production shape:
  *
  *  1. [[fitReference]] runs the batch operator on a reference corpus
  *     and captures its unigram counts, total token mass, and the two
  *     bucket-boundary scores.
  *  2. [[bucketStream]] labels arriving documents STATELESSLY against
  *     those statistics: per-row scoring with the batch operator's
  *     exact integer-surprisal arithmetic (bit-length of
  *     `total div cnt`), bucket by score threshold. No shuffle, no
  *     state store — a document is labeled the instant it arrives,
  *     and the result is batch-equal for every document whose score
  *     is not exactly ON a boundary (a boundary score-tie GROUP is
  *     split by the batch cumulative mass across buckets — by doc id,
  *     not by score — which no score-threshold labeler can reproduce;
  *     the stream puts the whole group in the better bucket;
  *     spec-pinned).
  *  3. [[mergeFreqs]] keeps the reference statistics REFRESHABLE: the
  *     unigram state is a mergeable (term, cnt) frame — union-sum is
  *     associative and commutative (any split of the corpus merges to
  *     the same state, spec-pinned) but NOT replay-idempotent (counts
  *     double on a redelivered delta — unlike
  *     [[StreamContamination.mergeBenchmark]]'s distinct-set state),
  *     so callers gate deltas by batch id, the standard foreachBatch
  *     exactly-once discipline.
  *
  * Out-of-vocabulary terms take the reference's MAXIMUM integer
  * surprisal (`cnt = 1` — rarest-possible), the CCNet convention of
  * penalizing unknown tokens; `total` stays the reference total (the
  * stationarity assumption the offline-LM design already makes).
  */
object StreamPerplexity {

  /** Reference statistics captured by [[fitReference]]: unigram
    * counts, total token mass, and the two inclusive upper-boundary
    * scores (`headMax` / `middleMax`; `-Inf` for an empty bucket).
    */
  final case class RefStats(freqs: Map[String, Long], total: Long,
      headMax: Double, middleMax: Double)

  /** Fit [[RefStats]] on a reference corpus by running the batch
    * operator and reading off its boundary scores. The unigram map is
    * driver-collected and broadcast — vocabulary-sized, the same
    * ship-the-LM-to-every-worker trade CCNet's offline model already
    * makes; a reference whose vocabulary outgrows a broadcast needs a
    * count-min/top-K cut BEFORE fitting, not a bigger driver.
    */
  def fitReference(reference: DataFrame, idCol: String, textCol: String): RefStats = {
    val spark = reference.sparkSession
    import spark.implicits._
    val buckets = CurationOps.perplexityBuckets(reference, idCol, textCol)
      .select(col("bucket"), col("mean_bits"))
      .groupBy(col("bucket")).agg(max(col("mean_bits")).as("mx"))
      .as[(String, Double)].collect().toMap
    val freqs = reference
      .select(explode(TextTokens.wordsCol(col(textCol))).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val headMax = buckets.getOrElse("head", Double.NegativeInfinity)
    RefStats(freqs, freqs.valuesIterator.sum,
      headMax, math.max(headMax, buckets.getOrElse("middle", Double.NegativeInfinity)))
  }

  /** Merge a `(term, cnt)` unigram-state frame with a new document
    * delta (union + sum: associative and commutative, NOT
    * replay-idempotent — gate deltas by batch id;
    * localCheckpointed so the state's lineage stays flat across
    * refreshes).
    */
  def mergeFreqs(state: DataFrame, delta: DataFrame, textCol: String): DataFrame =
    state.union(
        delta.select(explode(TextTokens.wordsCol(col(textCol))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cnt")))
      .groupBy(col("term")).agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint()

  /** Label a document stream against fitted reference statistics.
    * Emits `(idCol, n_tokens, mean_bits, bucket)` per arriving
    * document with at least one word (the batch `explode` drops
    * empty documents too). Pure per-row map: works identically on a
    * streaming or batch frame.
    */
  def bucketStream(stream: DataFrame, stats: RefStats,
      idCol: String, textCol: String): DataFrame = {
    val spark = stream.sparkSession
    val statsB = spark.sparkContext.broadcast((stats.freqs, stats.total))
    val score = udf { (words: Seq[String]) =>
      val (freqs, total) = statsB.value
      var n = 0L
      var sumBits = 0L
      words.foreach { w =>
        // bit-length of (total div cnt) — the batch `length(bin(..))`
        val cnt = freqs.getOrElse(w, 1L)
        sumBits += 64 - java.lang.Long.numberOfLeadingZeros(total / cnt)
        n += 1
      }
      (n, sumBits.toDouble / n)
    }
    stream
      .withColumn("__ws", TextTokens.wordsCol(col(textCol)))
      .filter(size(col("__ws")) > 0)
      .withColumn("__s", score(col("__ws")))
      .select(col(idCol),
        col("__s._1").as("n_tokens"),
        col("__s._2").as("mean_bits"))
      .withColumn("bucket",
        when(col("mean_bits") <= stats.headMax, "head")
          .when(col("mean_bits") <= stats.middleMax, "middle")
          .otherwise("tail"))
  }
}
