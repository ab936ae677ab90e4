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
}
