package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.StreamLengthStats
import graft.textops.CurationOps

/** Streaming exact length statistics: bit-identical to the batch
  * operators under any batching, durable restart/replay/compaction.
  */
class StreamLengthStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs: Seq[(Long, String, String)] =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq

  private def rows(df: DataFrame): Map[String, Row] =
    df.collect().map(r => r.getString(0) -> r).toMap

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (rows(a), rows(b))
    assert(ra.keySet === rb.keySet)
    // bit-for-bit: compare raw doubles with ==, not tolerance
    for (k <- ra.keySet) assert(ra(k) === rb(k), s"stratum $k")
  }

  test("histogram path reproduces percentile_cont bit-for-bit") {
    val df = docs.toDF("doc_id", "lang", "text")
    assertSame(
      CurationOps.lengthPercentilesByHistogram(df, "lang", "text"),
      CurationOps.lengthPercentiles(df, "lang", "text"))
  }

  test("histogram ≡ percentile_cont on randomized corpora (20 trials)") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 20) {
      val nStrata = 1 + rnd.nextInt(4)
      val rows = (1 to 40 + rnd.nextInt(200)).map { i =>
        val words = 0 to rnd.nextInt(30)
        (i.toLong, s"s${rnd.nextInt(nStrata)}",
          words.drop(1).map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
      }
      val df = rows.toDF("doc_id", "lang", "text")
      assertSame(
        CurationOps.lengthPercentilesByHistogram(df, "lang", "text"),
        CurationOps.lengthPercentiles(df, "lang", "text"))
    }
  }

  test("session stats after any batching equal the batch operator on the union") {
    val all = docs
    val session = new StreamLengthStats.LengthStatsSession(spark, "lang", "text")
    all.grouped((all.size + 2) / 3).foreach { b =>
      session.ingest(b.toDF("doc_id", "lang", "text"))
    }
    assertSame(session.currentStats,
      CurationOps.lengthPercentiles(all.toDF("doc_id", "lang", "text"), "lang", "text"))
    // state is one row per (stratum, distinct length) — never more
    // rows than documents, usually far fewer
    assert(session.histogram.count() <= all.size.toLong)
    assert(session.histogram.columns.toSeq === Seq("lang", "v", "cnt"))
  }

  test("durable session: restart resumes, replay is exactly-once, compaction changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("lenstats").toString
    val all = docs
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val s1 = new StreamLengthStats.DurableLengthStatsSession(
      spark, dir, "lang", "text", compactEvery = 2)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("doc_id", "lang", "text"), i.toLong)
    }
    val expected = CurationOps.lengthPercentiles(
      all.toDF("doc_id", "lang", "text"), "lang", "text")
    assertSame(s1.currentStats, expected)
    // replay the LAST batch (at-least-once foreachBatch): counts unchanged
    s1.ingest(batches.last.toDF("doc_id", "lang", "text"), (batches.size - 1).toLong)
    assertSame(s1.currentStats, expected)
    // a fresh session over the same path (process restart) sees the same state
    val s2 = new StreamLengthStats.DurableLengthStatsSession(spark, dir, "lang", "text")
    assertSame(s2.currentStats, expected)
  }
}
