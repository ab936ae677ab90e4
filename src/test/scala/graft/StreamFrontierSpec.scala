package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.Frontier
import graft.streaming.StreamFrontier

/** The streamed politeness scheduler vs the batch one: the invariant
  * set holds unconditionally (gapless per-host slots in arrival
  * order, cross-batch budget, the offset law, within-batch priority
  * order), and streamed ≡ batch EXACTLY when each host's arrivals are
  * priority-monotone across batches — the documented ordering-law
  * divergence (a live session cannot preempt an already-assigned
  * slot, so cross-batch ordering is FIFO-by-arrival, not priority).
  */
class StreamFrontierSpec extends SparkSpec {
  import spark.implicits._

  private val delays = Seq(("h1", 500L), ("h2", 2000L)).toDF("host", "delay_ms")

  private def rows(df: DataFrame): Seq[(Long, String, Long, Long, Long)] =
    df.select(col("id"), col("host"), col("delay_ms"), col("slot"),
        col("fetch_offset_ms"))
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sorted

  test("single batch: streamed ≡ the batch scheduler exactly") {
    val urls = Seq((1L, "h1", 5L), (2L, "h1", 9L), (3L, "h2", 1L),
      (4L, "h3", 7L)).toDF("id", "host", "priority")
    val batch = Frontier.schedule(urls, "id", "host", col("priority"),
      delays, defaultDelayMs = 1000L, maxPerHost = 10)
    val s = new StreamFrontier.FrontierSession(spark, "id", "host",
      col("priority"), delays, defaultDelayMs = 1000L, maxPerHost = 10)
    s.ingest(urls)
    assert(rows(s.currentSchedule) == rows(batch))
  }

  test("priority-monotone arrivals: streamed ≡ batch over the union") {
    // per host, batch 1 carries strictly higher priorities than
    // batch 2 — the condition under which FIFO-by-arrival coincides
    // with the batch scheduler's global priority order
    val b1 = Seq((1L, "h1", 90L), (2L, "h1", 80L), (3L, "h2", 70L))
      .toDF("id", "host", "priority")
    val b2 = Seq((4L, "h1", 50L), (5L, "h2", 40L), (6L, "h2", 30L))
      .toDF("id", "host", "priority")
    val union = b1.unionByName(b2)
    val batch = Frontier.schedule(union, "id", "host", col("priority"),
      delays, 1000L, 10)
    val s = new StreamFrontier.FrontierSession(spark, "id", "host",
      col("priority"), delays, 1000L, 10)
    s.ingest(b1); s.ingest(b2)
    assert(rows(s.currentSchedule) == rows(batch))
  }

  test("invariants hold even when arrivals are NOT priority-monotone") {
    // batch 2 brings a HIGHER priority URL for h1 than batch 1's: the
    // live session must not (cannot) preempt — slots continue FIFO
    val b1 = Seq((1L, "h1", 10L), (2L, "h1", 5L)).toDF("id", "host", "priority")
    val b2 = Seq((3L, "h1", 99L), (4L, "h1", 1L)).toDF("id", "host", "priority")
    val s = new StreamFrontier.FrontierSession(spark, "id", "host",
      col("priority"), delays, 1000L, 3)
    s.ingest(b1); s.ingest(b2)
    val got = s.currentSchedule
      .select(col("id"), col("slot"), col("fetch_offset_ms"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._2)
    // gapless slots in arrival order; within batch 2, priority first;
    // budget (3) drops the last arrival
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.map(_._2) == Seq(0L, 1L, 2L))
    // offset law with h1's 500 ms delay
    assert(got.map(_._3) == Seq(0L, 500L, 1000L))
    // the divergence is REAL here: the batch scheduler would have put
    // id 3 (priority 99) at slot 0
    val batch = Frontier.schedule(b1.unionByName(b2), "id", "host",
      col("priority"), delays, 1000L, 3)
    val batchSlot0 = batch.filter(col("slot") === 0)
      .select(col("id")).as[Long].head()
    assert(batchSlot0 == 3L)
  }

  test("cross-batch budget: a host never exceeds maxPerHost across batches") {
    val s = new StreamFrontier.FrontierSession(spark, "id", "host",
      col("priority"), delays, 1000L, 5)
    (0 until 4).foreach { b =>
      val batch = (0 until 3).map(i => (b * 10L + i, "h1", 50L - b))
        .toDF("id", "host", "priority")
      s.ingest(batch)
    }
    val got = s.currentSchedule.select(col("slot")).as[Long].collect().toSeq
    assert(got.sorted == Seq(0L, 1L, 2L, 3L, 4L), s"slots: $got")
  }

  test("durable session: restart resumes slot continuation; replay is idempotent") {
    val dir = Files.createTempDirectory("frontier_ledger").toString
    def mk() = new StreamFrontier.DurableFrontierSession(spark, dir,
      delays, defaultDelayMs = 1000L, maxPerHost = 10)
    val b0 = Seq((1L, "h1", 9L), (2L, "h2", 8L)).toDF("id", "host", "priority")
    val b1 = Seq((3L, "h1", 7L), (4L, "h3", 6L)).toDF("id", "host", "priority")
    val s1 = mk()
    s1.ingest(b0, 0L)
    s1.ingest(b1, 1L)
    val expect = rows(s1.currentSchedule)
    assert(expect.map(r => (r._1, r._4)).sorted ==
      Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 0L)), s"slots: $expect")
    // replay of the last batch derives the identical rows (pure
    // function of batch + prior ledger; OCC publish keeps it single)
    s1.ingest(b1, 1L)
    assert(rows(s1.currentSchedule) == expect)
    // restart from disk: slot continuation resumes where it left off
    val s2 = mk()
    assert(rows(s2.currentSchedule) == expect)
    val b2 = Seq((5L, "h1", 1L)).toDF("id", "host", "priority")
    s2.ingest(b2, 2L)
    val h1Slots = s2.currentSchedule.filter(col("host") === "h1")
      .select(col("id"), col("slot")).as[(Long, Long)].collect().toMap
    assert(h1Slots == Map(1L -> 0L, 3L -> 1L, 5L -> 2L))
  }
}
