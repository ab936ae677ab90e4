package graft

import graft.streaming.StreamDomainCap
import graft.textops.CurationOps

/** Streaming per-domain quality budget: the maintained retention is
  * bit-identical to the batch operator over everything ingested,
  * under any batching; a better late arrival evicts a worse early
  * one; redelivery and restarts change nothing.
  */
class StreamDomainCapSpec extends SparkSpec {
  import spark.implicits._

  private val K = 2

  // (doc_id, domain, quality)
  private val rows = Seq(
    (1L, "a.com", 10L), (2L, "a.com", 30L), (3L, "a.com", 20L),
    (4L, "b.org", 5L), (5L, "b.org", 50L), (6L, "b.org", 40L),
    (7L, "c.net", 1L))

  private def batchOp(rs: Seq[(Long, String, Long)]): Set[(Long, String, Int)] =
    CurationOps.domainCapRetention(
        rs.toDF("doc_id", "domain", "quality"), "doc_id", "domain", "quality", K)
      .select($"doc_id", $"domain", $"rk").as[(Long, String, Int)].collect().toSet

  test("maintained retention equals the batch operator under any batching") {
    val expected = batchOp(rows)
    assert(expected === Set((2L, "a.com", 1), (3L, "a.com", 2),
      (5L, "b.org", 1), (6L, "b.org", 2), (7L, "c.net", 1)))
    for (parts <- Seq(1, 3, 7)) {
      val s = new StreamDomainCap.DomainCapSession(spark, "doc_id", "domain", "quality", K)
      var last: Set[(Long, String, Int)] = Set.empty
      rows.grouped((rows.size + parts - 1) / parts).foreach { b =>
        last = s.ingest(b.toDF("doc_id", "domain", "quality"))
          .select($"doc_id", $"domain", $"rk").as[(Long, String, Int)].collect().toSet
      }
      assert(last === expected, s"$parts-way batching diverged")
    }
  }

  test("a better late arrival evicts a worse early retention") {
    val s = new StreamDomainCap.DomainCapSession(spark, "doc_id", "domain", "quality", K)
    s.ingest(Seq((1L, "a.com", 10L), (3L, "a.com", 20L)).toDF("doc_id", "domain", "quality"))
    val after = s.ingest(Seq((2L, "a.com", 30L)).toDF("doc_id", "domain", "quality"))
      .select($"doc_id", $"rk").as[(Long, Int)].collect().toSet
    assert(after === Set((2L, 1), (3L, 2)))  // doc 1 evicted
  }

  test("durable session: restart resumes, replay exactly-once, compaction stable") {
    val dir = java.nio.file.Files.createTempDirectory("domaincap").toString
    val batches = rows.grouped(3).toSeq
    val s1 = new StreamDomainCap.DurableDomainCapSession(spark, dir, K, compactEvery = 2)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "domain", "quality"), i.toLong)
    }
    val expected = batchOp(rows)
    def got(s: StreamDomainCap.DurableDomainCapSession) =
      s.currentRetention.select($"doc_id", $"domain", $"rk")
        .as[(Long, String, Int)].collect().toSet
    assert(got(s1) === expected)
    s1.ingest(batches.last.toDF("doc_id", "domain", "quality"), (batches.size - 1).toLong)
    assert(got(s1) === expected)
    val s2 = new StreamDomainCap.DurableDomainCapSession(spark, dir, K)
    assert(got(s2) === expected)
    // candidate ledger bounded by k per domain per batch
    assert(s2.candidates.count() <=
      (batches.size * K * rows.map(_._2).distinct.size).toLong)
  }
}
