package graft

import java.sql.Timestamp

import graft.temporal.Temporal

/** Burst detection: hand-computed z on a flat-then-spike fixture, the
  * n >= 3 warm-up filter, per-type isolation, and the variance
  * regularizer on a zero-variance history.
  */
class TemporalBurstSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("flat history then a spike: exact z, warm-up rows filtered, types isolated") {
    // type "x": 5 events in each of hours 0..6, then 50 in hour 7.
    // type "y": 2 events in hours 0..7 — never bursts, never mixes with x.
    val rows =
      (0 to 6).flatMap(h => (1 to 5).map(m => (s"x$h$m", ts(h, m), 1L, "x"))) ++
      (1 to 50).map(m => (s"x7$m", ts(7, m), 1L, "x")) ++
      (0 to 7).flatMap(h => (1 to 2).map(m => (s"y$h$m", ts(h, m), 2L, "y")))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
    val out = Temporal.eventBursts(df, "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2),
        r.getDouble(4), r.getInt(5)))
    val x = out.filter(_._1 == "x").sortBy(_._2)
    // hours 0..2 have < 3 trailing hours → filtered; 3..7 remain
    assert(x.map(_._2) === (3 to 7).map(h => ts(h, 0).toString))
    // flat history: every pre-spike z is 0 (mean 5, c 5, var 0 → 0/1)
    assert(x.dropRight(1).forall(r => r._4 === 0.0 && r._5 === 0))
    // the spike: trailing 6 hours all 5 → z = (50-5)/sqrt(0+1) = 45
    val spike = x.last
    assert(spike._3 === 50L && spike._4 === 45.0 && spike._5 === 1)
    // type y: flat twos, no burst anywhere
    assert(out.filter(_._1 == "y").forall(r => r._4 === 0.0 && r._5 === 0))
  }

  test("nonzero variance: z matches the sample-variance formula") {
    // history counts 1..6 (hours 0..5), then 20 at hour 6
    val rows =
      (0 to 5).flatMap(h => (1 to h + 1).map(m => (s"a$h$m", ts(h, m), 1L, "a"))) ++
      (1 to 20).map(m => (s"a6$m", ts(6, m), 1L, "a"))
    val out = Temporal.eventBursts(rows.toDF("event_id", "ts", "user_id", "event_type"),
        "event_type", "ts")
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(4))).toMap
    // hour 6: trailing counts 1..6 → mean 3.5, sample var 3.5
    val expected = BigDecimal((20 - 3.5) / math.sqrt(3.5 + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(ts(6, 0).toString) === expected)
  }
}
