package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSpanDedup
import graft.textops.CurationOps

/** Streaming cross-doc span dedup: single-batch equality with the
  * batch operator, cross-batch first-arrival-wins invariants,
  * full-redelivery drop, and ledger replay-idempotence.
  */
class StreamSpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val R = 2

  private def runBatches(batches: Seq[Seq[(Long, String)]])
      : (Seq[Map[Long, (Long, Long, String)]], StreamSpanDedup.SpanDedupSession) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val session = new StreamSpanDedup.SpanDedupSession(spark, "doc_id", "text", K, R)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Map[Long, (Long, Long, String)]]
    val q = session.start(stream.toDS().toDF("doc_id", "text")) { (out, _) =>
      val rows = out.as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      if (rows.nonEmpty) emitted += rows
    }
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    (emitted.toSeq, session)
  }

  private def batchOp(df: DataFrame): Map[Long, (Long, Long, String)] =
    CurationOps.winnowedSpanDedup(df, "doc_id", "text", K, R)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a single batch against an empty ledger equals the batch operator") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (emitted, _) = runBatches(Seq(docs))
    assert(emitted.size == 1)
    assert(emitted.head == batchOp(docs.toDF("doc_id", "text")))
    assert(emitted.head.values.exists(_._2 > 0), "fixture must contain dropped spans")
  }

  test("across batches: first arrival wins, redelivery drops everything, " +
       "ledger is replay-idempotent") {
    // long shared prefix: chunk boundaries away from the junction are
    // identical across docs (the winnow window reaches only
    // radius + shingle words past a position), so doc 3's early chunks
    // certainly coincide with doc 1's
    val shared = ((1 to 24).map(i => s"w$i") ++ Seq("alpha", "bravo", "charlie"))
      .mkString(" ")
    val b1 = Seq(1L -> shared)
    val b2 = Seq(
      2L -> shared, // full redelivery of the same content
      3L -> (shared + " kilo lima mike november oscar papa quebec romeo"))
    val (emitted, session) = runBatches(Seq(b1, b2, b1.map { case (_, t) => (4L, t) }))
    val Seq(o1, o2, o3) = emitted
    // batch 1: nothing seen, everything kept
    assert(o1(1L)._2 == 0 && o1(1L)._3.nonEmpty)
    // batch 2: doc 2's every chunk was admitted by doc 1 -> fully dropped
    assert(o2(2L)._2 == o2(2L)._1 && o2(2L)._3.isEmpty)
    // doc 3 keeps its novel tail but loses what overlaps doc 1's spans
    assert(o2(3L)._2 > 0 && o2(3L)._3.nonEmpty)
    assert(!o2(3L)._3.contains("w1 w2 w3")) // deep-prefix spans deduped
    // batch 3: same content again under a new id -> still fully dropped
    assert(o3(4L)._2 == o3(4L)._1 && o3(4L)._3.isEmpty)
    // cross-batch invariant: kept chunk multiset has no duplicates
    val keptChunks = emitted.flatMap(_.values.map(_._3).filter(_.nonEmpty))
    // the ledger equals the distinct chunk hashes of everything sent —
    // replaying batch 1's content (batches 2 and 3) grew nothing new
    // beyond doc 3's novel chunks
    val ledgerAfter = session.ledger.count()
    val allDocs = (b1 ++ b2).toDF("doc_id", "text")
    val expected = CurationOps.winnowedSpanDedup(allDocs, "doc_id", "text", K, R)
    assert(ledgerAfter ==
      expected.agg(org.apache.spark.sql.functions.sum($"n_chunks" - $"n_dropped"))
        .as[Long].head())
    assert(keptChunks.distinct.size == keptChunks.size)
  }

  test("durable ledger: admitted spans survive a session RESTART; batch replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("durable-span").toString
    val shared = ((1 to 24).map(i => s"w$i") ++ Seq("alpha", "bravo", "charlie"))
      .mkString(" ")
    def newSession() = new StreamSpanDedup.DurableSpanDedupSession(
      spark, s"$base/ledger", "doc_id", "text", K, R)
    val stream = MemoryStream[(Long, String)]
    val got = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long, String)]
    def start(s: StreamSpanDedup.DurableSpanDedupSession) =
      s.start(stream.toDS().toDF("doc_id", "text"), Some(s"$base/cp")) { (out, _) =>
        out.as[(Long, Long, Long, String)].collect()
          .foreach(r => got(r._1) = ((r._2, r._3, r._4)))
      }
    val q1 = start(newSession())
    stream.addData(1L -> shared); q1.processAllAvailable(); q1.stop()
    assert(got(1L)._2 == 0 && got(1L)._3.nonEmpty) // nothing seen: all kept
    // restart: a NEW session object (driver memory gone) over the same
    // ledger path + checkpoint — the duplicate must be dropped by state
    // that came back from DISK, not from the in-memory frame
    val s2 = newSession()
    val q2 = start(s2)
    stream.addData(2L -> shared); q2.processAllAvailable(); q2.stop()
    assert(got(2L)._2 == got(2L)._1 && got(2L)._3.isEmpty)
    // replay of batch 1 (same id, same content): its own directory is
    // excluded on read, the recommit is byte-equivalent — ledger
    // unchanged, result identical
    val before = s2.ledger.count()
    val replay = s2.ingest(Seq(2L -> shared).toDF("doc_id", "text"), 1L)
      .as[(Long, Long, Long, String)].collect().head
    assert(replay._3 == replay._2 && replay._4.isEmpty)
    assert(s2.ledger.count() == before)
    // the committed ledger is exactly the batch operator's chunk set
    val expected = CurationOps.winnowedChunks(
        Seq(1L -> shared).toDF("doc_id", "text"), "doc_id", "text", K, R)
      .select($"__ch").distinct().count()
    assert(before == expected)
  }
}
