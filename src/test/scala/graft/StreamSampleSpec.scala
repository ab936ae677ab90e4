package graft

import graft.streaming.StreamSample
import graft.textops.CurationOps

/** Streaming stratified sample: the maintained bottom-k sample is
  * bit-identical to the batch operator over everything ingested, under
  * any batching; redelivery and restarts change nothing.
  */
class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  private val K = 7
  private val Salt = "strat"

  private def docs: Seq[(Long, String, String)] =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq

  private def batchSample(rows: Seq[(Long, String, String)]): Set[(Long, String, Int)] =
    CurationOps.stratifiedSample(
        rows.toDF("doc_id", "lang", "text"), "doc_id", "lang", K, Salt)
      .select($"doc_id", $"lang", $"rk").as[(Long, String, Int)].collect().toSet

  test("maintained sample equals the batch operator under any batching") {
    val all = docs
    val expected = batchSample(all)
    assert(expected.nonEmpty && expected.exists(_._3 == K),
      "fixture must fill at least one stratum")
    for (parts <- Seq(1, 3, 5)) {
      val session = new StreamSample.SampleSession(spark, "doc_id", "lang", K, Salt)
      var last: Set[(Long, String, Int)] = Set.empty
      all.grouped((all.size + parts - 1) / parts).foreach { b =>
        last = session.ingest(b.toDF("doc_id", "lang", "text"))
          .select($"doc_id", $"lang", $"rk").as[(Long, String, Int)].collect().toSet
      }
      assert(last === expected, s"$parts-way batching diverged")
    }
  }

  test("redelivering a batch changes nothing (idempotent fold)") {
    val all = docs
    val session = new StreamSample.SampleSession(spark, "doc_id", "lang", K, Salt)
    val half = all.take(all.size / 2)
    session.ingest(half.toDF("doc_id", "lang", "text"))
    val afterOnce = session.ingest(half.toDF("doc_id", "lang", "text"))
      .select($"doc_id", $"lang", $"rk").as[(Long, String, Int)].collect().toSet
    assert(afterOnce === batchSample(half))
  }

  test("durable session: restart resumes, replay exactly-once, compaction stable") {
    val dir = java.nio.file.Files.createTempDirectory("streamsample").toString
    val all = docs.map { case (id, lang, text) => (id, lang, text) }
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val s1 = new StreamSample.DurableSampleSession(spark, dir, K, Salt, compactEvery = 2)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "stratum", "text"), i.toLong)
    }
    val expected = CurationOps.stratifiedSample(
        all.toDF("doc_id", "stratum", "text"), "doc_id", "stratum", K, Salt)
      .select($"doc_id", $"stratum", $"rk").as[(Long, String, Int)].collect().toSet
    def got(s: StreamSample.DurableSampleSession) =
      s.currentSample.select($"doc_id", $"stratum", $"rk")
        .as[(Long, String, Int)].collect().toSet
    assert(got(s1) === expected)
    // replay the last batch
    s1.ingest(batches.last.toDF("doc_id", "stratum", "text"), (batches.size - 1).toLong)
    assert(got(s1) === expected)
    // restart
    val s2 = new StreamSample.DurableSampleSession(spark, dir, K, Salt)
    assert(got(s2) === expected)
    // candidate ledger is bounded: at most k per stratum per batch
    val strata = all.map(_._2).distinct.size
    assert(s2.candidates.count() <= (batches.size * K * strata).toLong)
  }
}
