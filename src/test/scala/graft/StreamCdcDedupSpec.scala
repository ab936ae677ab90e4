package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamCdcDedup
import graft.textops.CurationOps

/** Streaming CDC block-dedup accounting: single-batch equality with
  * cdcDedupStats, streamed ≡ batch over randomized split points,
  * redelivery, and the durable-restart contract.
  */
class StreamCdcDedupSpec extends SparkSpec {
  import spark.implicits._

  private type Stats = Map[Long, (Long, Long, Long)]

  private def docs(n: Int): Seq[(Long, String)] = {
    // overlapping content: doc i shares a long block run with doc i-3
    // (the CDC reuse shape) plus a unique tail
    (0 until n).map { i =>
      val shared = (0 until 40).map(k => s"w${(i % 3) * 100 + k}").mkString(" ")
      val unique = (0 until 12).map(k => s"u${i}x$k").mkString(" ")
      (i.toLong, s"$shared $unique")
    }
  }

  private def batchStats(df: DataFrame): Stats =
    CurationOps.cdcDedupStats(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def collectStats(out: DataFrame): Stats =
    out.as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a single batch against an empty ledger equals cdcDedupStats") {
    val d = docs(30)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val session = new StreamCdcDedup.CdcDedupSession(spark, "doc_id", "text")
    var got: Stats = Map.empty
    val q = session.start(stream.toDS().toDF("doc_id", "text")) { (out, _) =>
      got = collectStats(out)
    }
    stream.addData(d: _*); q.processAllAvailable(); q.stop()
    val expected = batchStats(d.toDF("doc_id", "text"))
    assert(expected.values.exists(_._2 > 0), "fixture must contain block reuse")
    assert(got == expected)
  }

  test("streamed ≡ batch under randomized split points (ascending-id batches)") {
    val d = docs(40)
    val expected = batchStats(d.toDF("doc_id", "text"))
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      // random split points over the id-ordered stream — the live-crawl
      // shape (arrival order = corpus order, batch boundaries arbitrary)
      val cuts = (Seq(0, d.size) ++ Seq.fill(3)(rnd.nextInt(d.size))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => d.slice(a, b) }
        .filter(_.nonEmpty)
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val session = new StreamCdcDedup.CdcDedupSession(spark, "doc_id", "text")
      var acc: Stats = Map.empty
      val q = session.start(stream.toDS().toDF("doc_id", "text")) { (out, _) =>
        acc = acc ++ collectStats(out)
      }
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      assert(acc == expected, s"trial $trial with cuts $cuts")
    }
  }

  test("durable session: replayed batch reports identical stats and grows nothing") {
    val path = Files.createTempDirectory("cdcledger").toFile.getAbsolutePath
    val d = docs(24)
    val (b0, b1) = d.splitAt(12)
    val s1 = new StreamCdcDedup.DurableCdcDedupSession(spark, path, "doc_id", "text")
    val r0 = collectStats(s1.ingest(b0.toDF("doc_id", "text"), 0L))
    val r1 = collectStats(s1.ingest(b1.toDF("doc_id", "text"), 1L))
    val ledgerAfter = s1.ledger.as[String].collect().sorted.toSeq
    // replay batch 1 (crash-before-sink-ack): identical output, same ledger
    val r1b = collectStats(s1.ingest(b1.toDF("doc_id", "text"), 1L))
    assert(r1b == r1)
    assert(s1.ledger.as[String].collect().sorted.toSeq == ledgerAfter)
    // streamed union equals the batch operator on the whole corpus
    assert(r0 ++ r1 == batchStats(d.toDF("doc_id", "text")))
  }

  test("durable session survives a restart: a fresh instance continues the accounting") {
    val path = Files.createTempDirectory("cdcledger").toFile.getAbsolutePath
    val d = docs(24)
    val (b0, b1) = d.splitAt(12)
    val s1 = new StreamCdcDedup.DurableCdcDedupSession(
      spark, path, "doc_id", "text", compactEvery = 2)
    val r0 = collectStats(s1.ingest(b0.toDF("doc_id", "text"), 0L))
    // process "restart": new session object over the same ledger path
    val s2 = new StreamCdcDedup.DurableCdcDedupSession(
      spark, path, "doc_id", "text", compactEvery = 2)
    val r1 = collectStats(s2.ingest(b1.toDF("doc_id", "text"), 1L))
    assert(r0 ++ r1 == batchStats(d.toDF("doc_id", "text")),
      "blocks ingested before the restart stay attributed")
    // a block seen before the restart is reported duplicated after it
    val redel = collectStats(s2.ingest(Seq(d.head).toDF("doc_id", "text"), 2L))
    assert(redel(d.head._1)._2 > 0, "pre-restart blocks count as seen")
  }
}
