package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamFunnel

/** Streaming funnel: greedy single-int state, batch-equal final depths
  * under event-time-ordered arrival (the exchange-argument claim in the
  * scaladoc, replayed against the batch window form), monotone emitted
  * updates, cross-batch chains.
  */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Stages = Seq("view", "click", "purchase")

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  /** Runs batches through the stream, returns every emitted update in
    * order per key plus the final depth map.
    */
  private def run(batches: Seq[Seq[(java.sql.Timestamp, Long, Long, String)]]) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val df = stream.toDS().toDF("ts", "user_id", "event_id", "event_type")
    val name = s"fm_funnel_${System.nanoTime()}"
    val q = StreamFunnel.funnelStages(
        df, "user_id", "ts", "event_id", "event_type", Stages, watermark = "1 minute")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    val got = spark.table(name).as[(Long, Int)].collect().toSeq
    q.stop()
    got
  }

  test("funnel depth state survives a query restart from the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("funnel_cp").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val out = StreamFunnel.funnelStages(
      stream.toDS().toDF("ts", "user_id", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", Stages, watermark = "1 minute")
    val got = scala.collection.concurrent.TrieMap.empty[Long, Int]
    def start() = out.writeStream
      .option("checkpointLocation", dir)
      .outputMode(OutputMode.Update())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamFunnel.FunnelUpdate], _: Long) =>
          b.collect().foreach(u =>
            got(u.user_id) = math.max(got.getOrElse(u.user_id, 0), u.funnel_stage))
      }
      .start()
    val q1 = start()
    stream.addData((ts(10), 1L, 1L, "view")); q1.processAllAvailable(); q1.stop()
    // the click+purchase land on a FRESH query instance: depth 3 is
    // only reachable if the prefix state (depth 1) came back from the
    // checkpoint's state store
    val q2 = start()
    stream.addData((ts(20), 1L, 2L, "click"), (ts(30), 1L, 3L, "purchase"))
    q2.processAllAvailable(); q2.stop()
    assert(got.toMap == Map(1L -> 3))
  }

  private def batchStages(rows: Seq[(java.sql.Timestamp, Long, Long, String)]): Map[Long, Int] =
    graft.temporal.Temporal.funnelStages(
        rows.toDF("ts", "user_id", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", Stages)
      .as[(Long, Int)].collect().toMap

  test("final streamed depth equals batch funnelStages; zero-stage keys silent") {
    val rows = Seq(
      (ts(10), 1L, 1L, "purchase"), // out of order: not a conversion
      (ts(20), 1L, 2L, "view"),
      (ts(30), 1L, 3L, "click"),
      (ts(40), 1L, 4L, "purchase"),
      (ts(10), 2L, 5L, "click"),
      (ts(20), 2L, 6L, "view"),
      (ts(30), 2L, 7L, "purchase"),
      (ts(10), 3L, 8L, "error"))
    val got = run(Seq(rows))
    val finals = got.groupBy(_._1).map { case (k, us) => k -> us.map(_._2).max }
    val batch = batchStages(rows)
    assert(finals == batch.filter(_._2 > 0), s"stream=$finals batch=$batch")
    assert(!finals.contains(3L)) // never entered the funnel -> no update rows
  }

  test("chains complete across micro-batches and updates are strictly increasing") {
    val b1 = Seq((ts(10), 1L, 1L, "view"))
    val b2 = Seq((ts(20), 1L, 2L, "click"))
    val b3 = Seq((ts(30), 1L, 3L, "purchase"), (ts(30), 2L, 4L, "view"))
    val got = run(Seq(b1, b2, b3))
    assert(got.filter(_._1 == 1L).map(_._2) == Seq(1, 2, 3))
    assert(got.filter(_._1 == 2L).map(_._2) == Seq(1))
    // batch over the union agrees with the streamed final state
    assert(batchStages(b1 ++ b2 ++ b3) == Map(1L -> 3, 2L -> 1))
  }

  test("a whole chain inside one micro-batch advances all stages at once") {
    val rows = Seq(
      (ts(10), 7L, 1L, "view"),
      (ts(11), 7L, 2L, "click"),
      (ts(12), 7L, 3L, "purchase"))
    val got = run(Seq(rows))
    // one batch -> one emitted update carrying the final depth
    assert(got == Seq((7L, 3)))
  }

  test("randomized event logs: streamed finals equal batch at any time-ordered split") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val types = Array("view", "click", "purchase", "error")
      val rows = (1 to 60).map { i =>
        (ts(i.toLong), rnd.nextInt(5).toLong, i.toLong, types(rnd.nextInt(types.length)))
      }
      // split into 3 event-time-ordered micro-batches at random cuts
      val c1 = 10 + rnd.nextInt(20)
      val c2 = c1 + 5 + rnd.nextInt(20)
      val batches = Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.slice(c2, rows.length))
      val got = run(batches)
      val finals = got.groupBy(_._1).map { case (k, us) => k -> us.map(_._2).max }
      val batch = batchStages(rows)
      assert(finals == batch.filter(_._2 > 0),
        s"trial $trial cuts ($c1,$c2): stream=$finals batch=$batch")
      // emissions strictly increase per key
      got.groupBy(_._1).values.foreach { us =>
        assert(us.map(_._2) == us.map(_._2).sorted.distinct)
      }
    }
  }

  test("idle eviction is event-time: an evicted key restarts at depth 0") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val df = stream.toDS().toDF("ts", "user_id", "event_id", "event_type")
    val name = s"fm_funnel_evict_${System.nanoTime()}"
    val q = StreamFunnel.funnelStages(
        df, "user_id", "ts", "event_id", "event_type", Stages,
        watermark = "0 seconds", idleTimeout = "10 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    // user 1 reaches depth 2
    stream.addData((ts(10), 1L, 1L, "view"), (ts(11), 1L, 2L, "click"))
    q.processAllAvailable()
    // another key's far-future event drives the watermark way past
    // user 1's idle horizon; the NEXT batch fires user 1's timeout
    stream.addData((ts(1000), 2L, 3L, "view"))
    q.processAllAvailable()
    stream.addData((ts(2000), 2L, 4L, "error"))
    q.processAllAvailable()
    // user 1 re-enters: with state evicted this purchase alone cannot
    // resume the old chain at depth 3 — no new row for user 1; a fresh
    // view then restarts at depth 1
    stream.addData((ts(2001), 1L, 5L, "purchase"))
    q.processAllAvailable()
    stream.addData((ts(2002), 1L, 6L, "view"))
    q.processAllAvailable()
    val got = spark.table(name).as[(Long, Int)].collect().toSeq
    q.stop()
    val u1 = got.filter(_._1 == 1L).map(_._2)
    assert(u1 == Seq(2, 1), s"expected pre-eviction [2] then restart [1], got $u1")
  }

  test("windowed stream funnel: closest-completion state, batch-equal at random splits") {
    implicit val sqlCtx = spark.sqlContext
    def runWin(batches: Seq[Seq[(java.sql.Timestamp, Long, Long, String)]], horizonSec: Long) = {
      val stream = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
      val df = stream.toDS().toDF("ts", "user_id", "event_id", "event_type")
      val name = s"fm_funnel_win_${System.nanoTime()}"
      val q = StreamFunnel.funnelStagesWithin(
          df, "user_id", "ts", "event_id", "event_type", Stages, horizonSec,
          watermark = "1 minute")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      val got = spark.table(name).as[(Long, Int)].collect().toSeq
      q.stop()
      got
    }
    // the depth-only-greedy trap: the SECOND view puts the click in
    // horizon, and the chain completes across a batch boundary
    val trap = Seq(
      Seq((ts(1), 1L, 1L, "view"), (ts(51), 1L, 2L, "view")),
      Seq((ts(101), 1L, 3L, "click")))
    assert(runWin(trap, horizonSec = 60L).filter(_._1 == 1L).map(_._2) == Seq(1, 2))
    // randomized parity with the batch operator
    val rnd = new scala.util.Random(29)
    (1 to 2).foreach { trial =>
      val types = Array("view", "click", "purchase", "error")
      val rows = (1 to 50).map { i =>
        (ts(i.toLong * 7), rnd.nextInt(4).toLong, i.toLong, types(rnd.nextInt(types.length)))
      }
      val cut = 10 + rnd.nextInt(30)
      val got = runWin(Seq(rows.take(cut), rows.drop(cut)), horizonSec = 20L)
      val finals = got.groupBy(_._1).map { case (k, us) => k -> us.map(_._2).max }
      val batch = graft.temporal.Temporal.funnelStagesWithin(
          rows.toDF("ts", "user_id", "event_id", "event_type"),
          "user_id", "ts", "event_id", "event_type", Stages, horizonSec = 20L)
        .as[(Long, Int)].collect().toMap
      assert(finals == batch.filter(_._2 > 0), s"trial $trial: stream=$finals batch=$batch")
    }
  }

  test("windowed funnel evicts idle keys by event time, like funnelStages") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val df = stream.toDS().toDF("ts", "user_id", "event_id", "event_type")
    val name = s"fm_funnel_win_evict_${System.nanoTime()}"
    val q = StreamFunnel.funnelStagesWithin(
        df, "user_id", "ts", "event_id", "event_type", Stages, horizonSec = 3600L,
        watermark = "0 seconds", idleTimeout = "10 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    // user 1 reaches depth 2 within horizon
    stream.addData((ts(10), 1L, 1L, "view"), (ts(11), 1L, 2L, "click"))
    q.processAllAvailable()
    // watermark jumps far past the idle horizon; next batch fires eviction
    stream.addData((ts(1000), 2L, 3L, "view"))
    q.processAllAvailable()
    stream.addData((ts(2000), 2L, 4L, "error"))
    q.processAllAvailable()
    // evicted: a purchase alone cannot resume at depth 3; a fresh view
    // restarts the chain at depth 1
    stream.addData((ts(2001), 1L, 5L, "purchase"))
    q.processAllAvailable()
    stream.addData((ts(2002), 1L, 6L, "view"))
    q.processAllAvailable()
    val got = spark.table(name).as[(Long, Int)].collect().toSeq
    q.stop()
    val u1 = got.filter(_._1 == 1L).map(_._2)
    assert(u1 == Seq(2, 1), s"expected pre-eviction [2] then restart [1], got $u1")
  }

  test("same-timestamp events fold in event_id order (tiebreak parity with batch)") {
    val rows = Seq(
      (ts(10), 5L, 2L, "click"),  // same instant, higher id than the view
      (ts(10), 5L, 1L, "view"))
    val got = run(Seq(rows))
    val finals = got.groupBy(_._1).map { case (k, us) => k -> us.map(_._2).max }
    assert(finals == Map(5L -> 2))
    assert(batchStages(rows) == Map(5L -> 2))
  }
}
