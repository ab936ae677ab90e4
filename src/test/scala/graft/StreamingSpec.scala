package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Intake
import graft.streaming.Intake.IntakeItem

class StreamingSpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("intake is idempotent across redelivery and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-intake").toString
    val frontier = s"$dir/frontier"
    val checkpoint1 = s"$dir/cp1"

    // batch 1: a.com delivered twice (SQS redelivery), b.com once
    val stream1 = MemoryStream[IntakeItem]
    stream1.addData(
      IntakeItem("a.com", "b1", ts(1)),
      IntakeItem("a.com", "b1", ts(2)),
      IntakeItem("b.com", "b1", ts(3)))
    val q1 = Intake.runIntake(stream1.toDS(), frontier, checkpoint1)
    q1.awaitTermination(30000)

    val after1 = spark.read.parquet(frontier).select("etld1").as[String].collect().sorted
    assert(after1.toSeq == Seq("a.com", "b.com"))

    // batch 2 (fresh query, fresh checkpoint — simulates a restart):
    // a.com redelivered again + c.com new
    val stream2 = MemoryStream[IntakeItem]
    stream2.addData(IntakeItem("a.com", "b2", ts(4)), IntakeItem("c.com", "b2", ts(5)))
    val q2 = Intake.runIntake(stream2.toDS(), frontier, s"$dir/cp2")
    q2.awaitTermination(30000)

    val after2 = spark.read.parquet(frontier).select("etld1").as[String].collect().sorted
    assert(after2.toSeq == Seq("a.com", "b.com", "c.com"))

    // the frontier is laid out hash-bucketed so each micro-batch's
    // anti-join read prunes to the touched partition directories
    val bucketDirs = new java.io.File(frontier).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
  }

  test("streaming sessionize finalizes sessions past the watermark, matching batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = stream.toDS().toDF("ts", "user_id", "value")
    val sessions = graft.temporal.Temporal.sessionizeStream(
      df, "user_id", "ts", "value", gap = "5 minutes", watermark = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    // u1: events 100s apart chain into one session; u2: one event
    val closed = Seq(
      (ts(1000), "u1", 1.5), (ts(1100), "u1", 2.5), (ts(1030), "u2", 4.0))
    stream.addData(closed: _*)
    q.processAllAvailable()
    // nothing finalized yet — watermark has not passed session ends
    assert(spark.table("sessions").isEmpty)
    // an event far past end+watermark closes both sessions; its own
    // session stays open and must NOT be emitted
    stream.addData((ts(9000), "u1", 9.9))
    q.processAllAvailable()
    val got = spark.table("sessions")
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(_._1)
    q.stop()
    val batch = graft.temporal.Temporal.sessionize(
        closed.toDF("ts", "user_id", "value"), "user_id", "ts", "value", "5 minutes")
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq == batch.toSeq)
    assert(got.map(_._1).toSeq == Seq("u1", "u2"))
    assert(got(0)._4 == 2 && got(0)._5 == 4.0) // u1: two events, 1.5+2.5
  }

  test("windowed event stats with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = stream.toDS().toDF("ts", "event_type", "value")
    val agg = Intake.windowedEventStats(df, "ts", watermark = "1 minute", window = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("winstats")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(
      (ts(0), "click", 1.0), (ts(60), "click", 2.0),   // window [0,300)
      (ts(400), "view", 5.0))                          // window [300,600)
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n, sum_value FROM winstats ORDER BY event_type")
      .as[(String, Long, Double)].collect()
    q.stop()
    assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }
}
