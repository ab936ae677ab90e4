package graft

import org.apache.spark.sql.DataFrame

import graft.streaming.StreamSearchIndex
import graft.textops.Retrieval

/** Maintained inverted index: index-form scoring is bit-identical to
  * the batch rankers, the stream fold is replay-idempotent, and the
  * durable variant survives restart + compaction.
  */
class StreamSearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Query = Seq("spark", "join", "window")
  private val K = 10

  private def docs: Seq[(Long, String)] =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

  private def rows(df: DataFrame): Seq[(Long, Double, Int)] =
    df.select(df.columns.head, "score", "rk")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq

  test("index-form BM25 and QL are bit-identical to the batch rankers") {
    val df = docs.toDF("doc_id", "text")
    val d = Retrieval.docStats(df, "doc_id", "text")
    val p = Retrieval.termPostings(df, "doc_id", "text")
    assert(rows(Retrieval.bm25FromIndex(d, p, Query, K)) ===
      rows(Retrieval.bm25TopK(df, "doc_id", "text", Query, K)))
    assert(rows(Retrieval.qlFromIndex(d, p, Query, K)) ===
      rows(Retrieval.qlTopK(df, "doc_id", "text", Query, K)))
  }

  test("session search equals the batch rankers over everything ingested; replay is a no-op") {
    val all = docs
    val session = new StreamSearchIndex.SearchIndexSession(spark, "doc_id", "text")
    val batches = all.grouped((all.size + 2) / 3).toSeq
    batches.foreach(b => session.ingest(b.toDF("doc_id", "text")))
    val df = all.toDF("doc_id", "text")
    assert(rows(session.searchBm25(Query, K)) ===
      rows(Retrieval.bm25TopK(df, "doc_id", "text", Query, K)))
    assert(rows(session.searchQl(Query, K)) ===
      rows(Retrieval.qlTopK(df, "doc_id", "text", Query, K)))
    // replay the last batch: identical rows collapse in the distinct
    val (nd, np) = (session.docs.count(), session.postings.count())
    session.ingest(batches.last.toDF("doc_id", "text"))
    assert(session.docs.count() === nd && session.postings.count() === np)
    assert(rows(session.searchBm25(Query, K)) ===
      rows(Retrieval.bm25TopK(df, "doc_id", "text", Query, K)))
  }

  test("upsert re-indexes modified docs, delete removes them — both sessions") {
    val v1 = Seq((1L, "spark join spark"), (2L, "spark window"), (3L, "join join"))
    val v2docs = Seq((1L, "window window window"))   // doc 1 rewritten
    val afterUpsert = Seq((1L, "window window window"), (2L, "spark window"), (3L, "join join"))
    val afterDelete = afterUpsert.filterNot(_._1 == 2L)
    def expect(corpus: Seq[(Long, String)]) =
      rows(Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text", Query, K))

    // in-memory
    val mem = new StreamSearchIndex.SearchIndexSession(spark, "doc_id", "text")
    mem.ingest(v1.toDF("doc_id", "text"))
    mem.upsert(v2docs.toDF("doc_id", "text"))
    assert(rows(mem.searchBm25(Query, K)) === expect(afterUpsert))
    mem.delete(Seq(2L))
    assert(rows(mem.searchBm25(Query, K)) === expect(afterDelete))

    // durable: versions resolve newest-wins, tombstones filter, and a
    // restart sees the post-delete state
    val dir = java.nio.file.Files.createTempDirectory("searchidx_up").toString
    val dur = new StreamSearchIndex.DurableSearchIndexSession(
      spark, dir, "doc_id", "text", compactEvery = 2)
    dur.ingest(v1.toDF("doc_id", "text"), 0L)
    dur.upsert(v2docs.toDF("doc_id", "text"), 1L)
    assert(rows(dur.searchBm25(Query, K)) === expect(afterUpsert))
    dur.delete(Seq(2L), 2L)
    assert(rows(dur.searchBm25(Query, K)) === expect(afterDelete))
    // replay the delete batch — identical tombstone, nothing changes
    dur.delete(Seq(2L), 2L)
    assert(rows(dur.searchBm25(Query, K)) === expect(afterDelete))
    val reopened = new StreamSearchIndex.DurableSearchIndexSession(spark, dir, "doc_id", "text")
    assert(rows(reopened.searchBm25(Query, K)) === expect(afterDelete))
    assert(rows(reopened.searchQl(Query, K)) ===
      rows(Retrieval.qlTopK(afterDelete.toDF("doc_id", "text"), "doc_id", "text", Query, K)))
  }

  test("durable session: restart resumes, replay exactly-once, compaction stable") {
    val dir = java.nio.file.Files.createTempDirectory("searchidx").toString
    val all = docs
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val s1 = new StreamSearchIndex.DurableSearchIndexSession(
      spark, dir, "doc_id", "text", compactEvery = 2)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "text"), i.toLong)
    }
    val df = all.toDF("doc_id", "text")
    val expected = rows(Retrieval.bm25TopK(df, "doc_id", "text", Query, K))
    assert(rows(s1.searchBm25(Query, K)) === expected)
    s1.ingest(batches.last.toDF("doc_id", "text"), (batches.size - 1).toLong)
    assert(rows(s1.searchBm25(Query, K)) === expected)
    val s2 = new StreamSearchIndex.DurableSearchIndexSession(spark, dir, "doc_id", "text")
    assert(rows(s2.searchBm25(Query, K)) === expected)
    assert(rows(s2.searchQl(Query, K)) ===
      rows(Retrieval.qlTopK(df, "doc_id", "text", Query, K)))
  }
}
