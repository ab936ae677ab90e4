package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamKnLm
import graft.textops.CurationOps

/** Incremental KN LM: count merging must reproduce the batch-trained
  * LM EXACTLY (sufficient-statistic additivity), across random splits,
  * restarts, replays, and compaction.
  */
class StreamKnLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")

  private def lmSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"w1", $"w2", $"n", $"ctx", $"n1f", $"n1b", $"b_types", $"p_kn")
      .as[(String, String, Long, Long, Long, Long, Long, Double)]
      .collect().toSet

  private lazy val batchLm = lmSet(CurationOps.knBigramLm(docs, "text", minCount = 2))

  test("streamed counts over random splits derive the batch LM exactly") {
    implicit val sqlCtx = spark.sqlContext
    val session = new StreamKnLm.KnLmSession(spark, "text", minCount = 2)
    val rows = docs.as[(Long, String)].collect().toSeq
    val rnd = new scala.util.Random(5)
    val stream = MemoryStream[(Long, String)]
    val q = session.start(stream.toDS().toDF("doc_id", "text"))
    rows.groupBy(_ => rnd.nextInt(4)).values.foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = lmSet(session.currentLm)
    assert(streamed == batchLm)
    assert(streamed.nonEmpty)
  }

  private def lm3Set(df: org.apache.spark.sql.DataFrame) =
    df.select($"w1", $"w2", $"w3", $"n", $"ctx3", $"f3", $"c23", $"nctx2",
        $"m2", $"n1b", $"b_types", $"p_kn3")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10), r.getDouble(11))).toSet

  private lazy val batchLm3 =
    lm3Set(CurationOps.knTrigramLm(docs, "text", minCount = 2))

  test("streamed TRIGRAM counts over random splits derive the batch LM exactly") {
    implicit val sqlCtx = spark.sqlContext
    val session = new StreamKnLm.KnTrigramLmSession(spark, "text", minCount = 2)
    val rows = docs.as[(Long, String)].collect().toSeq
    val rnd = new scala.util.Random(7)
    val stream = MemoryStream[(Long, String)]
    val q = session.start(stream.toDS().toDF("doc_id", "text"))
    rows.groupBy(_ => rnd.nextInt(4)).values.foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = lm3Set(session.currentLm)
    assert(streamed == batchLm3)
    assert(streamed.nonEmpty)
  }

  test("durable TRIGRAM counts: restart + replay + compaction preserve exactness") {
    val path = java.nio.file.Files.createTempDirectory("kn3lm").toFile.getAbsolutePath
    val rows = docs.as[(Long, String)].collect().toSeq
    val splits = rows.grouped((rows.size + 2) / 3).toSeq
    val a = new StreamKnLm.DurableKnTrigramLmSession(spark, path, "text",
      minCount = 2, compactEvery = 2)
    a.ingest(splits(0).toDF("doc_id", "text"), 0L)
    a.ingest(splits(1).toDF("doc_id", "text"), 1L) // triggers folds
    // "restart": fresh session over the same path
    val b = new StreamKnLm.DurableKnTrigramLmSession(spark, path, "text",
      minCount = 2, compactEvery = 2)
    b.ingest(splits(2).toDF("doc_id", "text"), 2L)
    assert(lm3Set(b.currentLm) == batchLm3)
    // replay of the newest batch: identical delta directories in BOTH
    // ledgers
    val t0 = b.currentTriCounts.as[(String, String, String, Long)].collect().toSet
    val g0 = b.currentBigCounts.as[(String, String, Long)].collect().toSet
    b.ingest(splits(2).toDF("doc_id", "text"), 2L)
    assert(b.currentTriCounts.as[(String, String, String, Long)].collect().toSet == t0)
    assert(b.currentBigCounts.as[(String, String, Long)].collect().toSet == g0)
    assert(lm3Set(b.currentLm) == batchLm3)
  }

  test("durable counts: restart + replay + compaction preserve LM exactness") {
    val path = java.nio.file.Files.createTempDirectory("knlm").toFile.getAbsolutePath
    val rows = docs.as[(Long, String)].collect().toSeq
    val splits = rows.grouped((rows.size + 2) / 3).toSeq
    val a = new StreamKnLm.DurableKnLmSession(spark, path, "text",
      minCount = 2, compactEvery = 2)
    a.ingest(splits(0).toDF("doc_id", "text"), 0L)
    a.ingest(splits(1).toDF("doc_id", "text"), 1L) // triggers a fold
    // "restart": fresh session over the same path
    val b = new StreamKnLm.DurableKnLmSession(spark, path, "text",
      minCount = 2, compactEvery = 2)
    b.ingest(splits(2).toDF("doc_id", "text"), 2L)
    assert(lmSet(b.currentLm) == batchLm)
    // replay of the newest batch: identical delta directory
    val c0 = b.currentCounts.as[(String, String, Long)].collect().toSet
    b.ingest(splits(2).toDF("doc_id", "text"), 2L)
    assert(b.currentCounts.as[(String, String, Long)].collect().toSet == c0)
    assert(lmSet(b.currentLm) == batchLm)
  }
}
