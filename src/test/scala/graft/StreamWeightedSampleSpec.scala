package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.avg
import org.apache.spark.sql.types._

import graft.streaming.{DurableLedger, StreamWeightedSample}
import graft.textops.CurationOps

/** A-ES weighted sampling: the selection is a mergeable bottom-k, so
  * the streamed sample is BIT-IDENTICAL (key doubles included) to the
  * batch operator over everything ingested; durable twin survives
  * restart, replay, and compaction.
  */
class StreamWeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def rows(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, 1L + rnd.nextInt(1000).toLong))
  }

  private def sampled(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select($"id", $"weight", $"es_key").as[(Long, Long, Double)]
      .collect().toSeq.sortBy(_._1)

  test("weightedSample: deterministic, weight-monotone in expectation, zero-weight excluded") {
    val df = (rows(5, 300) :+ (9999L, 0L) :+ (9998L, -3L)).toDF("id", "weight")
    val a = CurationOps.weightedSample(df, "id", "weight", k = 40, salt = "s")
    val b = CurationOps.weightedSample(df, "id", "weight", k = 40, salt = "s")
    assert(sampled(a) === sampled(b)) // fully deterministic
    val ids = a.select($"id").as[Long].collect().toSet
    assert(!ids.contains(9999L) && !ids.contains(9998L))
    // weight-proportional tilt: the sampled mean weight exceeds the
    // population mean by a wide margin on 1..1000-uniform weights
    val popMean = rows(5, 300).map(_._2).sum.toDouble / 300
    val sampMean = a.select(avg($"weight".cast("double"))).as[Double].collect().head
    assert(sampMean > popMean)
  }

  test("in-memory session equals the batch sample under random batching") {
    val d = rows(11, 400)
    val whole = d.toDF("id", "weight")
    val session = new StreamWeightedSample.WeightedSampleSession(
      spark, "id", "weight", k = 30, salt = "es")
    val rnd = new scala.util.Random(3)
    d.groupBy(_ => rnd.nextInt(6)).values.foreach { b =>
      session.ingest(b.toDF("id", "weight"))
    }
    assert(sampled(session.currentSample) ===
      sampled(CurationOps.weightedSample(whole, "id", "weight", 30, "es")))
  }

  test("durable session: restart, replay, compaction preserve the sample; ledger bounded") {
    val dir = Files.createTempDirectory("ws_ledger").toString
    val d = rows(23, 300)
    val batches = d.grouped(100).toSeq
    val s1 = new StreamWeightedSample.DurableWeightedSampleSession(
      spark, dir, k = 25, salt = "es")
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("id", "weight"), i.toLong)
    }
    val expect = sampled(CurationOps.weightedSample(
      d.toDF("id", "weight"), "id", "weight", 25, "es"))
    assert(sampled(s1.currentSample) === expect)
    // candidate ledger holds at most k rows per batch
    assert(s1.candidates.count() <= 25L * batches.size)
    // replay overwrites, no growth
    s1.ingest(batches.head.toDF("id", "weight"), 0L)
    assert(sampled(s1.currentSample) === expect)
    // restart
    val s2 = new StreamWeightedSample.DurableWeightedSampleSession(
      spark, dir, k = 25, salt = "es")
    assert(sampled(s2.currentSample) === expect)
    // compaction
    DurableLedger.compact(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("weight", LongType),
      StructField("es_key", DoubleType))))
    assert(sampled(s2.currentSample) === expect)
  }
}
