package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sketch.Sketches
import graft.streaming.{DurableLedger, StreamSketches}

/** Streamed ≡ batch for the sketch trio — CELL-FOR-CELL equality, not
  * within-epsilon: each session's merge law (sum / max / union) is the
  * same fold the batch operator computes in one pass, so state after
  * any batching of the corpus equals the whole-corpus sketch. Durable
  * twins additionally pin replay semantics: overwrite-by-batch-id
  * keeps the ADDITIVE CMS exactly-once, while HLL/Bloom survive even
  * at-least-once duplication (new batch id, same rows) because their
  * merges are idempotent.
  */
class StreamSketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(s"w${rnd.nextInt(400)}")
  }

  private def splits(items: Seq[String], seed: Int, k: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    items.groupBy(_ => rnd.nextInt(k)).values.toSeq
  }

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("in-memory sessions equal the batch sketches under random batching") {
    val items = corpus(11, 3000)
    val whole = items.toDF("item")
    val cms = new StreamSketches.CmsSession(spark, "item", depth = 4, width = 64)
    val hll = new StreamSketches.HllSession(spark, "item")
    val bloom = new StreamSketches.BloomSession(spark, "item", k = 3, mBits = 4096)
    splits(items, 7, 6).foreach { b =>
      val df = b.toDF("item")
      cms.ingest(df); hll.ingest(df); bloom.ingest(df)
    }
    assert(same(cms.sketch.get, Sketches.cmsTable(whole, "item", 4, 64)))
    assert(same(hll.registers.get, Sketches.hllRegisters(whole, "item")))
    assert(same(bloom.bits.get, Sketches.bloomBits(whole, "item", 3, 4096)))
  }

  test("durable CMS: replay overwrites, restart reloads, compaction preserves the fold") {
    val dir = Files.createTempDirectory("cms_ledger").toString
    val items = corpus(23, 2400)
    val batches = splits(items, 3, 4)
    val s1 = new StreamSketches.DurableCmsSession(spark, dir, "item", 4, 64)
    batches.zipWithIndex.foreach { case (b, i) => s1.ingest(b.toDF("item"), i.toLong) }
    val expect = Sketches.cmsTable(items.toDF("item"), "item", 4, 64)
    assert(same(s1.sketch, expect))
    // replayed batch (same id, same rows) overwrites its own directory:
    // the additive fold does NOT double-count
    s1.ingest(batches.head.toDF("item"), 0L)
    assert(same(s1.sketch, expect))
    // restart: a fresh session over the same ledger sees the same fold
    val s2 = new StreamSketches.DurableCmsSession(spark, dir, "item", 4, 64)
    assert(same(s2.sketch, expect))
    // compaction folds segments without changing the sum
    val folded = DurableLedger.compact(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sk_row", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType))))
    assert(folded >= 0)
    assert(same(s2.sketch, expect))
    // estimates over the durable fold never undercount
    val exact = items.toDF("item").groupBy($"item").agg(count(lit(1)).as("exact"))
    val bad = s2.estimates(exact, "item").join(exact, "item")
      .filter($"cms_est" < $"exact").count()
    assert(bad === 0L)
  }

  test("durable HLL and Bloom: idempotent merges survive at-least-once duplication") {
    val hllDir = Files.createTempDirectory("hll_ledger").toString
    val bloomDir = Files.createTempDirectory("bloom_ledger").toString
    val items = corpus(31, 2000)
    val batches = splits(items, 9, 3)
    val hll = new StreamSketches.DurableHllSession(spark, hllDir, "item")
    val bloom = new StreamSketches.DurableBloomSession(spark, bloomDir, "item", 3, 4096)
    batches.zipWithIndex.foreach { case (b, i) =>
      hll.ingest(b.toDF("item"), i.toLong); bloom.ingest(b.toDF("item"), i.toLong)
    }
    val expectReg = Sketches.hllRegisters(items.toDF("item"), "item")
    val expectBits = Sketches.bloomBits(items.toDF("item"), "item", 3, 4096)
    assert(same(hll.registers, expectReg))
    assert(same(bloom.bits, expectBits))
    // at-least-once: the SAME rows land again under a NEW batch id —
    // max/union folds are unchanged (no overwrite needed)
    hll.ingest(batches.head.toDF("item"), 99L)
    bloom.ingest(batches.head.toDF("item"), 99L)
    assert(same(hll.registers, expectReg))
    assert(same(bloom.bits, expectBits))
    // the durable estimate matches the batch estimator bit-for-bit
    assert(same(hll.estimate,
      Sketches.hllEstimate(Sketches.hllRegisters(items.toDF("item"), "item"))))
  }
}
