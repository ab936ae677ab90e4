package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamSessionize

/** The custom-state (`flatMapGroupsWithState`) sessionize: emitted
  * exactly once per closed session, batch-equal to
  * `Temporal.sessionize` including the touching-windows merge, and
  * correct under out-of-order arrival within the watermark — the cases
  * the native `session_window` twin is pinned on, replayed against the
  * hand-rolled state machine.
  */
class StreamSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  private def run(batches: Seq[Seq[(java.sql.Timestamp, Long, Double)]],
      gap: String = "5 minutes", watermark: String = "1 minute") = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = stream.toDS().toDF("ts", "user_id", "value")
    val name = s"fm_sessions_${System.nanoTime()}"
    val q = StreamSessionize.sessionize(df, "user_id", "ts", "value", gap, watermark)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    val got = spark.table(name)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2.getTime))
    q.stop()
    got
  }

  private def batch(rows: Seq[(java.sql.Timestamp, Long, Double)]) =
    graft.temporal.Temporal.sessionize(
        rows.toDF("ts", "user_id", "value"), "user_id", "ts", "value", "5 minutes")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2.getTime))

  test("closed sessions match batch sessionize; open sessions withheld") {
    val closed = Seq(
      (ts(1000), 1L, 1.5), (ts(1100), 1L, 2.5), // one chained session
      (ts(1030), 2L, 4.0),
      (ts(2000), 1L, 8.0))                      // separate session (900s gap)
    // the flusher event closes everything prior; its own session stays
    // open and must not appear
    val got = run(Seq(closed, Seq((ts(9000), 1L, 0.0))))
    assert(got == batch(closed))
    assert(got.map(_._1) == Seq(1L, 1L, 2L))
    assert(got.head._4 == 2L && got.head._5 == 4.0)
  }

  test("touching-windows merge: an event exactly gap after still extends") {
    val closed = Seq(
      (ts(1000), 1L, 1.0),
      (ts(1300), 1L, 2.0))  // exactly 300s = gap later: same session
    val got = run(Seq(closed, Seq((ts(9000), 1L, 0.0))))
    assert(got == batch(closed))
    assert(got.size == 1 && got.head._4 == 2L)
  }

  test("out-of-order arrival within the watermark merges two open sessions") {
    // batch 1: two events 600s apart -> two open sessions; batch 2: a
    // bridging event at 1300 (inside the 1-minute watermark? watermark
    // after batch 1 = 1600 - 60 = 1540... bridge must be >= watermark).
    // Use a tighter layout: events at 1000 and 1500 (500s apart, two
    // sessions); bridge at 1490 arrives late but >= watermark (1440).
    val all = Seq(
      (ts(1000), 1L, 1.0), (ts(1500), 1L, 2.0),
      (ts(1290), 1L, 4.0)) // bridges: 1290 within 300 of 1000-chain and of 1500
    // 10-minute watermark so the bridge (1290, behind the max 1500) is
    // still admitted when it arrives in the second batch
    val got = run(Seq(all.take(2), Seq(all(2)), Seq((ts(9000), 1L, 0.0))),
      watermark = "10 minutes")
    assert(got == batch(all))
    assert(got.size == 1 && got.head._4 == 3L && got.head._5 == 7.0)
  }

  test("each session emitted exactly once across many flushes") {
    val s1 = Seq((ts(1000), 1L, 1.0))
    val got = run(Seq(s1, Seq((ts(5000), 1L, 2.0)), Seq((ts(9000), 1L, 4.0)),
      Seq((ts(20000), 1L, 0.0))))
    // three separate closed sessions, one row each
    assert(got.map(_._4) == Seq(1L, 1L, 1L))
    assert(got.map(_._5) == Seq(1.0, 2.0, 4.0))
  }

  test("exact cents accumulation (no double drift)") {
    val closed = Seq((ts(1000), 1L, 0.1), (ts(1001), 1L, 0.2))
    val got = run(Seq(closed, Seq((ts(9000), 1L, 0.0))))
    assert(got.head._5 == 0.3)
  }

  test("all-null values emit a NULL sum, matching batch sum(decimal)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, java.lang.Double)]
    val df = stream.toDS().toDF("ts", "user_id", "value")
    val name = s"fm_sessions_null_${System.nanoTime()}"
    val q = StreamSessionize.sessionize(df, "user_id", "ts", "value",
        "5 minutes", "1 minute")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    stream.addData((ts(1000), 1L, null), (ts(1001), 1L, null),
      (ts(1000), 2L, null), (ts(1001), 2L, java.lang.Double.valueOf(5.0)))
    q.processAllAvailable()
    stream.addData((ts(9000), 1L, java.lang.Double.valueOf(0.0)))
    q.processAllAvailable()
    val got = spark.table(name)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Option[Double])]
      .collect().sortBy(_._1)
    q.stop()
    assert(got.length == 2)
    assert(got(0)._5.isEmpty)        // all-null session -> NULL
    assert(got(1)._5.contains(5.0))  // null + value -> value
  }
  test("open-session state survives a query restart from the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sess_cp").toString
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val out = StreamSessionize.sessionize(
      stream.toDS().toDF("ts", "user_id", "value"),
      "user_id", "ts", "value", gap = "5 minutes", watermark = "1 minute")
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
    def start() = out.writeStream
      .option("checkpointLocation", dir)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StreamSessionize.SessionRow],
            _: Long) =>
          b.collect().foreach(r => got.synchronized {
            got += ((r.user_id, r.session_start, r.session_end, r.n_events))
          })
      }
      .start()
    val q1 = start()
    stream.addData((ts(1000), 1L, 1.0)); q1.processAllAvailable(); q1.stop()
    // the session continues within the gap on a FRESH query instance,
    // then an event far past end+watermark closes it: one merged
    // session spanning both instances is only possible if the open
    // session came back from the state store
    val q2 = start()
    stream.addData((ts(1100), 1L, 2.0)); q2.processAllAvailable()
    stream.addData((ts(9000), 1L, 9.9)); q2.processAllAvailable()
    q2.stop()
    // session_end follows the session_window convention: last + gap
    assert(got.toList == List((1L, ts(1000), ts(1100 + 300), 2L)))
  }
}
