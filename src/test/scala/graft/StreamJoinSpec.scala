package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

/** Stream-stream interval join (the attribution join): window boundary
  * semantics, cross-batch matching (both sides buffered in state), and
  * batch equivalence of the same predicate.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("purchases match same-user views within the window, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val vStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val purchases = pStream.toDS().toDF("user_id", "pts", "purchase_id")
    val views = vStream.toDS().toDF("user_id", "vts", "view_id")
    val joined = StreamJoin.attributionJoin(
      purchases, views, "user_id", "pts", "vts",
      windowSec = 600, watermark = "1 minute")
    val name = s"attr_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    // batch 1: views arrive first (buffered in state)
    vStream.addData((1L, ts(1000), 101L), // 600s before the purchase: in window
      (1L, ts(390), 102L),                // 1210s before: out of window
      (2L, ts(1500), 103L))               // other user
    q.processAllAvailable()
    // batch 2: purchases arrive later and still match batch-1 views
    pStream.addData((1L, ts(1600), 11L), (2L, ts(1600), 12L))
    q.processAllAvailable()
    // batch 3: a view AFTER the purchase never matches (vts <= pts)
    vStream.addData((1L, ts(1601), 104L))
    q.processAllAvailable()
    val got = spark.table(name)
      .select($"purchase_id", $"view_id")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(got === Set((11L, 101L), (12L, 103L)))
  }

  test("streamed result equals the batch join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val vStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val pRows = Seq((1L, ts(1000), 11L), (1L, ts(2000), 12L), (2L, ts(1500), 13L))
    val vRows = Seq((1L, ts(900), 101L), (1L, ts(1999), 102L),
      (2L, ts(1499), 103L), (2L, ts(100), 104L))
    val joined = StreamJoin.attributionJoin(
      pStream.toDS().toDF("user_id", "pts", "purchase_id"),
      vStream.toDS().toDF("user_id", "vts", "view_id"),
      "user_id", "pts", "vts", windowSec = 600, watermark = "1 minute")
    val name = s"attr_batcheq_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    pStream.addData(pRows: _*)
    vStream.addData(vRows: _*)
    q.processAllAvailable()
    val streamed = spark.table(name)
      .select($"purchase_id", $"view_id").as[(Long, Long)].collect().toSet
    q.stop()
    val p = pRows.toDF("user_id", "pts", "purchase_id")
    val v = vRows.toDF("u2", "vts", "view_id")
    val batch = p.join(v,
        $"user_id" === $"u2" && $"vts" >= $"pts" - org.apache.spark.sql.functions.expr("INTERVAL 600 SECONDS") && $"vts" <= $"pts")
      .select($"purchase_id", $"view_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.contains((11L, 101L)) && batch.contains((13L, 103L)))
    assert(!batch.contains((13L, 104L))) // 1400s gap: out of window
  }
}
