package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.streaming.StreamEventBursts
import graft.temporal.Temporal

/** Streaming burst monitoring: bit-identical to the batch operator
  * under any batching (counts are additive integers), durable
  * restart/replay/compaction.
  */
class StreamEventBurstsSpec extends SparkSpec {
  import spark.implicits._

  private def events: Seq[(Long, Timestamp, String)] =
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"ts", $"event_type")
      .as[(Long, Timestamp, String)].collect().toSeq

  private def rows(df: DataFrame): Set[(String, String, Long, Double, Double, Int)] =
    df.collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5))).toSet

  test("session bursts equal the batch operator under any batching") {
    val all = events
    val expected = rows(Temporal.eventBursts(
      all.toDF("event_id", "ts", "event_type"), "event_type", "ts"))
    assert(expected.nonEmpty)
    for (parts <- Seq(2, 5)) {
      val s = new StreamEventBursts.EventBurstsSession(spark, "event_type", "ts")
      var last: Set[(String, String, Long, Double, Double, Int)] = Set.empty
      all.grouped((all.size + parts - 1) / parts).foreach { b =>
        last = rows(s.ingest(b.toDF("event_id", "ts", "event_type")))
      }
      assert(last === expected, s"$parts-way batching diverged")
      // state is the bounded hourly table, not the event log
      assert(s.hourly.count() < all.size.toLong)
    }
  }

  test("durable session: restart resumes, replay exactly-once, compaction stable") {
    val dir = java.nio.file.Files.createTempDirectory("bursts").toString
    val all = events
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val s1 = new StreamEventBursts.DurableEventBurstsSession(
      spark, dir, "event_type", "ts", compactEvery = 2)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("event_id", "ts", "event_type"), i.toLong)
    }
    val expected = rows(Temporal.eventBursts(
      all.toDF("event_id", "ts", "event_type"), "event_type", "ts"))
    assert(rows(s1.currentBursts) === expected)
    s1.ingest(batches.last.toDF("event_id", "ts", "event_type"), (batches.size - 1).toLong)
    assert(rows(s1.currentBursts) === expected)
    val s2 = new StreamEventBursts.DurableEventBurstsSession(spark, dir, "event_type", "ts")
    assert(rows(s2.currentBursts) === expected)
  }
}
