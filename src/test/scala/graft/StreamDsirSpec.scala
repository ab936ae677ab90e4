package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamDsir
import graft.textops.Dsir

/** Streamed DSIR fit: panel ≡ batch under any split (counters merge
  * exactly → weights and scores match bit-for-bit), durable
  * restart/replay idempotency.
  */
class StreamDsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) = ids.map { i =>
    (i.toLong,
      if (i % 3 == 0) s"alpha beta target doc$i" else s"delta zeta raw doc$i",
      if (i % 3 == 0) 1 else 0)
  }.toDF("id", "text", "is_t")

  test("streamed panel, weights, and scores ≡ batch under any split") {
    val all = docs(1 to 30)
    val batchW = Dsir.logRatiosE6(
      Dsir.bucketPanel(all, "text", $"is_t" === 1, 64), 64)
    val batchScores = Dsir.score(all, "id", "text", batchW)
      .as[(Long, Long, Long, Int)].collect().toSet
    for (split <- Seq(Seq(1 to 30), Seq(1 to 7, 8 to 30), Seq(1 to 10, 11 to 20, 21 to 30))) {
      val s = new StreamDsir.DsirSession("text", $"is_t" === 1, 64)
      split.foreach(r => s.ingest(docs(r)))
      assert(s.currentWeights.toSeq == batchW.toSeq, s"weights diverged: $split")
      assert(s.score(all, "id").as[(Long, Long, Long, Int)].collect().toSet ==
        batchScores, s"scores diverged: $split")
    }
  }

  test("durable twin: restart re-derives weights; replay is idempotent") {
    val path = Files.createTempDirectory("dsirledger").toFile.getAbsolutePath
    val s1 = new StreamDsir.DurableDsirSession(spark, path, buckets = 64)
    s1.ingest(docs(1 to 15).withColumnRenamed("is_t", "is_target"), 0L)
    s1.ingest(docs(16 to 30).withColumnRenamed("is_t", "is_target"), 1L)
    val w = s1.currentWeights.toSeq
    s1.ingest(docs(16 to 30).withColumnRenamed("is_t", "is_target"), 1L) // replay
    assert(s1.currentWeights.toSeq == w)
    val s2 = new StreamDsir.DurableDsirSession(spark, path, buckets = 64)
    assert(s2.currentWeights.toSeq == w, "restart must see the same fit")
    val batch = Dsir.logRatiosE6(
      Dsir.bucketPanel(docs(1 to 30), "text", $"is_t" === 1, 64), 64)
    assert(w == batch.toSeq, "durable fold ≡ batch fit")
  }

  test("panelForBuckets prunes directories by bucket stats, identical results") {
    // find single words whose buckets land in disjoint thirds of the
    // space, by asking the SAME fold the panel uses
    def bucketOf(word: String): Long =
      Dsir.bucketPanel(Seq(word).toDF("text"), "text", lit(false), 256)
        .select($"bucket").head.getLong(0)
    val lowW = (0 to 500).iterator.map(i => s"w$i")
      .find(bucketOf(_) < 64).get
    val highW = (0 to 500).iterator.map(i => s"v$i")
      .find(bucketOf(_) >= 192).get
    def batchOf(word: String) =
      Seq((word, 1), (word, 0)).toDF("text", "is_target")
    val path = Files.createTempDirectory("dsirledger").toFile.getAbsolutePath
    val s = new StreamDsir.DurableDsirSession(spark, path, buckets = 256)
    s.ingest(batchOf(lowW), 0L)
    s.ingest(batchOf(highW), 1L)
    def dirs(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val lo = s.panelForBuckets(0L, 63L)
    assert(dirs(lo).size == 1,
      s"the high-bucket batch dir must be stats-pruned: ${dirs(lo)}")
    assert(rows(lo) ==
      rows(s.currentPanel.filter($"bucket" <= 63)))
    // out-of-domain range: every directory pruned, empty result
    val none = s.panelForBuckets(300L, 400L)
    assert(none.inputFiles.isEmpty && none.count() == 0L)
    // compaction folds batch 0 into a segment (newest stays live);
    // merged stats keep pruning where provable, results identical
    assert(s.compactNow() == 1)
    val hi = s.panelForBuckets(192L, 255L)
    assert(dirs(hi).size == 1,
      s"the low-bucket segment must be stats-pruned: ${dirs(hi)}")
    assert(rows(hi) ==
      rows(s.currentPanel.filter($"bucket" >= 192)))
  }
}
