package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.streaming.{StreamSpanDedup, StreamVectorIndex}
import graft.textops.CurationOps
import graft.vectors.Vectors

/** Incremental re-curation driven by a corpus snapshot diff — the
  * composition a CONTINUOUSLY-REFRESHED 100 TB corpus runs nightly,
  * at demo scale. Run:
  * `sbt "runMain graft.examples.IncrementalCurationDemo"`.
  *
  * The point of the demo: after the first full build, per-refresh
  * cost is proportional to the DELTA, not the corpus —
  *
  *  1. [[CurationOps.snapshotDiff]] classifies the new snapshot
  *     against the previous one by content hash; `unchanged` rows
  *     (the overwhelming majority of a real refresh) are never
  *     re-processed;
  *  2. `added` + `changed` docs flow through the durable span-dedup
  *     ledger ([[StreamSpanDedup.DurableSpanDedupSession]]) — the
  *     parquet ledger already holds every admitted chunk hash, so
  *     re-curating the delta dedups against the WHOLE corpus history
  *     at O(delta) join cost;
  *  3. the same delta embeds (stub features at demo scale) and lands
  *     in the durable IVF index
  *     ([[StreamVectorIndex.DurableIvfIndexSession]]) — new vectors
  *     are searchable immediately, earlier batches' directories are
  *     untouched;
  *  4. `removed` ids are reported for downstream retention handling
  *     (ledger compaction folds them out out-of-band — dedup
  *     semantics are first-arrival-wins either way).
  *
  * Both sessions survive process restarts (state is on disk), so the
  * nightly run IS a restart — exactly the deployment shape the
  * durable seams exist for.
  */
object IncrementalCurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-incremental-curation")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val docs = Tables.load(spark, sfDir, "documents").select($"doc_id", $"text")

    // ---- night 0: the previous snapshot (everything except the docs
    // that will "arrive" tonight), bootstrapped through the SAME
    // sessions the refresh uses
    val old = docs.filter($"doc_id" % 7 =!= 0)
    val span = new StreamSpanDedup.DurableSpanDedupSession(
      spark, s"$base/span-ledger", "doc_id", "text",
      shingleWords = 3, winnowRadius = 2)
    val night0 = span.ingest(old, batchId = 0L)
    println(s"night 0: ${night0.count()} docs curated, " +
      s"ledger ${span.ledger.count()} chunk hashes")

    val centers = Vectors.hyperplanes(8, 16, seed = 5)
    val ivf = new StreamVectorIndex.DurableIvfIndexSession(
      spark, s"$base/ivf-index", "doc_id", "emb", centers)
    def embedded(df: org.apache.spark.sql.DataFrame) =
      Multimodal.embedStub(
        df.select($"doc_id".as("media_id"), lit("text").as("kind"),
            $"text".cast("binary").as("bytes"), lit("demo").as("source"))
          .as[Multimodal.MediaRow], dim = 16)
        .toDF().select($"media_id".as("doc_id"), $"embedding".as("emb"))
    ivf.ingest(embedded(old), batchId = 0L)
    println(s"night 0: index ${ivf.index.count()} vectors")

    // ---- night 1: tonight's snapshot = the full table with every
    // 13th doc edited; diff against the stored previous snapshot
    val tonight = docs.withColumn("text",
      when($"doc_id" % 13 === 0, concat($"text", lit(" update"))).otherwise($"text"))
    val diff = CurationOps.snapshotDiff(old, tonight, "doc_id", "text")
      .localCheckpoint()
    diff.groupBy($"status").count().orderBy($"status").show(false)

    // only the delta is re-curated — unchanged rows never move
    val deltaIds = diff.filter($"status".isin("added", "changed"))
      .select($"doc_id")
    val delta = tonight.join(deltaIds, "doc_id").localCheckpoint()
    val nDelta = delta.count()

    // block-level accounting INSIDE the changed docs: content-defined
    // chunk boundaries mean an edit invalidates only its local blocks
    // — the re-embed bill is the fresh word mass, not the docs' total
    val blockBill = CurationOps.cdcBlockDiff(
        old.join(deltaIds, "doc_id"), delta, "doc_id", "text")
      .agg(sum($"n_blocks").as("blocks"), sum($"n_reused").as("reused"),
        sum($"fresh_words").as("fresh_words"))
      .collect().head
    println(s"night 1 block bill: ${blockBill.getAs[Long]("reused")} of " +
      s"${blockBill.getAs[Long]("blocks")} changed-doc blocks reusable; " +
      s"only ${blockBill.getAs[Long]("fresh_words")} words need re-embedding")

    val night1 = span.ingest(delta, batchId = 1L)
    val dropped = night1.agg(sum($"n_dropped")).as[Long].head()
    println(s"night 1: re-curated $nDelta delta docs (of ${tonight.count()}); " +
      s"$dropped spans deduped against the corpus-history ledger; " +
      s"ledger now ${span.ledger.count()}")

    ivf.ingest(embedded(delta), batchId = 1L)
    val probe = embedded(tonight.filter($"doc_id" % 97 === 0).limit(3))
    val hits = ivf.search(probe, k = 3, nProbe = centers.length)
    println(s"night 1: index ${ivf.index.count()} vectors; " +
      s"probe search returned ${hits.count()} rows")

    val removed = diff.filter($"status" === "removed").count()
    println(s"night 1: $removed removed ids reported for retention handling")

    // ---- maintenance turn: fold the accumulated batch directories
    // into compaction segments (atomic-manifest swap; the newest batch
    // is never folded, so a replay of tonight's batch stays exact).
    // After years of nightly O(delta) appends this is what keeps the
    // ledgers at a bounded file count — and it must change NOTHING.
    val ledgerBefore = span.ledger.count()
    val indexBefore = ivf.index.count()
    val folded = Seq(
      graft.streaming.DurableLedger.compact(spark, s"$base/span-ledger",
        span.ledger.schema),
      // the index session folds with its LEDGER schema (ver column
      // included) — the live view drops versions after resolution
      ivf.compact()).sum
    assert(span.ledger.count() == ledgerBefore)
    assert(ivf.index.count() == indexBefore)
    println(s"maintenance: compacted $folded batch directories; " +
      s"ledger/index contents unchanged")

    // ---- night 2: a post-compaction refresh behaves identically —
    // the sessions read the segment + live directories transparently
    val night2docs = docs.filter($"doc_id" % 97 === 0)
      .withColumn("text", concat($"text", lit(" night2")))
    val night2 = span.ingest(night2docs, batchId = 2L)
    ivf.ingest(embedded(night2docs), batchId = 2L)
    println(s"night 2 (post-compaction): ${night2.count()} docs curated, " +
      s"ledger ${span.ledger.count()}, index ${ivf.index.count()} vectors")
    spark.stop()
  }
}
