package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.textops.NearDup

/** Streaming twin of [[graft.textops.CurationOps.contaminationScore]]
  * — continuous benchmark-contamination scoring for a live ingest
  * pipeline (the batch op's reference semantics: every document gets
  * `|distinct shingle hashes ∩ benchmark| / |distinct shingle hashes|`,
  * an UNROUNDED division of exact integers).
  *
  * Two shapes, matching how the benchmark side behaves:
  *
  *  1. '''Static benchmark''' → [[scoreStream]]: a stateless per-row
  *     probe (no shuffle, no state store, append mode) against a
  *     driver-collected benchmark hash set. Because the score is a
  *     per-document function of (document, benchmark), a static
  *     benchmark makes the streaming result EQUAL to the batch result
  *     row-for-row regardless of how the stream is micro-batched —
  *     spec-pinned over randomized splits.
  *
  *  2. '''Growing benchmark''' (new eval sets registered while the
  *     corpus streams) → [[runScoring]]: `foreachBatch` re-reads the
  *     current benchmark state at each micro-batch boundary and runs
  *     the EXACT batch operator on the batch frame, so every emitted
  *     row equals `contaminationScore(batch, benchmarkAsOfBatch)` by
  *     construction. The benchmark side is kept MERGEABLE:
  *     [[benchmarkHashes]] reduces an eval set to its distinct 60-bit
  *     shingle hashes and [[mergeBenchmark]] unions states —
  *     associative and idempotent, so late or replayed benchmark
  *     deliveries cannot corrupt it (the same keyed-MERGE contract as
  *     the rest of the engine's sinks).
  *
  * Scale shape: the probe side is benchmark-sized (eval sets are MBs,
  * the corpus is TBs — [[graft.textops.CurationOps.decontaminate]]'s
  * contract), so the document stream is never shuffled and holds no
  * per-key state; memory is bounded by the benchmark hash set, not the
  * stream's lifetime. When the benchmark outgrows an exact set, the
  * Bloom pre-pass ([[graft.textops.CurationOps.decontaminateBloomFlags]])
  * composes in front unchanged — its filter is mergeable too.
  */
object StreamContamination {

  /** An eval-set delta reduced to its mergeable form: the distinct
    * 60-bit shingle hashes, one `h: long` column.
    */
  def benchmarkHashes(benchmark: DataFrame, textCol: String, n: Int): DataFrame =
    benchmark
      .select(explode(NearDup.shinglesCol(col(textCol), n)).as("s"))
      .select(NearDup.shingleHash60(col("s")).as("h"))
      .distinct()

  /** Merge a benchmark-state frame with a new eval-set delta
    * (union + distinct: associative, commutative, idempotent). The
    * result is localCheckpointed so the state's lineage stays flat
    * across arbitrarily many merges (the ConnectedComponents-loop
    * convention) — without it, batch k's probe would replay k unions.
    */
  def mergeBenchmark(state: DataFrame, delta: DataFrame,
      textCol: String, n: Int): DataFrame =
    state.union(benchmarkHashes(delta, textCol, n)).distinct().localCheckpoint()

  /** Stateless streaming contamination score against a STATIC
    * benchmark. Emits, per arriving document with at least one
    * shingle, the batch operator's exact columns
    * `(idCol, n_shingles, n_shared, contamination)` — zero-shingle
    * documents are dropped like the batch `explode` drops them.
    *
    * The batch op's `explode → broadcast join → countDistinct` is
    * re-expressed as per-row array math (`array_distinct` over the
    * shingle hashes ≡ `countDistinct(h)`; the membership probe is a
    * driver-broadcast hash set, the Bloom-probe convention) so the
    * plan is a pure map: append output mode, no watermark, no state
    * store, no shuffle — a document is scored the instant it arrives.
    */
  def scoreStream(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    val benchSet = benchmarkHashes(benchmark, textCol, n)
      .collect().map(_.getLong(0)).toSet
    val benchB = spark.sparkContext.broadcast(benchSet)
    val inBench = udf((h: Long) => benchB.value.contains(h))
    val hashes = array_distinct(
      transform(NearDup.shinglesCol(col(textCol), n), s => NearDup.shingleHash60(s)))
    docs
      .withColumn("__hs", hashes)
      .filter(size(col("__hs")) > 0)
      .select(col(idCol),
        size(col("__hs")).cast("long").as("n_shingles"),
        size(filter(col("__hs"), h => inBench(h))).cast("long").as("n_shared"))
      .withColumn("contamination",
        col("n_shared").cast("double") / col("n_shingles").cast("double"))
  }

  /** Continuous scoring against a GROWING benchmark: each document
    * micro-batch runs the exact batch operator against
    * `currentBenchmarkHashes()` — the mergeable state frame as of the
    * batch boundary (callers update it with [[mergeBenchmark]] as eval
    * sets register). `sink` receives the scored frame plus the batch
    * id for an idempotent keyed write.
    *
    * The hash-frame probe is joined pre-hashed (the `h`-only state
    * never re-shingles), so the per-batch plan is the batch op's:
    * corpus batch exploded once, broadcast-joined, map-side-combined
    * aggregates.
    */
  def runScoring(docs: DataFrame, currentBenchmarkHashes: () => DataFrame,
      idCol: String, textCol: String, n: Int)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(scoreBatchAgainstHashes(
          batch, currentBenchmarkHashes(), idCol, textCol, n), batchId)
      }
      .start()

  /** [[graft.textops.CurationOps.contaminationScore]] with the
    * benchmark side already reduced to its hash frame (`h: long`) —
    * the state shape [[mergeBenchmark]] maintains. Identical plan
    * from the join on: explode, broadcast probe, map-side-combined
    * countDistincts, unrounded exact-integer ratio.
    */
  def scoreBatchAgainstHashes(corpus: DataFrame, benchHashes: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    corpus
      .select(col(idCol),
        explode(NearDup.shinglesCol(col(textCol), n)).as("s"))
      .select(col(idCol), NearDup.shingleHash60(col("s")).as("h"))
      .join(broadcast(benchHashes.withColumn("__hit", lit(1))), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("h")).as("n_shingles"),
        countDistinct(when(col("__hit").isNotNull, col("h"))).as("n_shared"))
      .withColumn("contamination",
        col("n_shared").cast("double") / col("n_shingles").cast("double"))
}
