package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.temporal.Temporal

/** Unit coverage for sessionization and the as-of join (q33-q34),
  * pinning the boundary semantics the DuckDB oracles mirror:
  *  - a gap of EXACTLY the session gap starts a new session (Spark's
  *    half-open `[start, last+gap)` windows);
  *  - the as-of match is inclusive (`right.ts <= left.ts`).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, Double)*) =
    rows.map { case (u, t, k, v) => (u, ts(t), k, v) }
      .toDF("user_id", "ts", "event_type", "value")

  test("sessionize merges at exactly the gap (touching windows) and splits past it") {
    val df = events(
      (1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, "2024-01-01 00:29:59", "view", 2.0),   // 29:59 after previous -> same session
      (1L, "2024-01-01 00:59:59", "view", 4.0),   // EXACTLY 30:00 after -> still merged
      (1L, "2024-01-01 01:30:00", "view", 8.0),   // 30:01 after -> new session
      (2L, "2024-01-01 10:00:00", "view", 16.0))
    val out = Temporal.sessionize(df, "user_id", "ts", "value", "30 minutes")
      .orderBy($"user_id", $"session_start").collect()
    assert(out.length === 3)
    val s1 = out(0)
    assert(s1.getAs[Timestamp]("session_start") === ts("2024-01-01 00:00:00"))
    assert(s1.getAs[Timestamp]("session_end") === ts("2024-01-01 01:29:59"))
    assert(s1.getAs[Long]("n_events") === 3L)
    assert(s1.getAs[Double]("sum_value") === 7.0)
    val s2 = out(1)
    assert(s2.getAs[Timestamp]("session_start") === ts("2024-01-01 01:30:00"))
    assert(s2.getAs[Timestamp]("session_end") === ts("2024-01-01 02:00:00"))
    assert(s2.getAs[Long]("n_events") === 1L)
    assert(out(2).getAs[Long]("user_id") === 2L)
  }

  test("sessionize sums value in exact decimal") {
    val df = events(
      (1L, "2024-01-01 00:00:00", "view", 0.1),
      (1L, "2024-01-01 00:00:01", "view", 0.2))
    val out = Temporal.sessionize(df, "user_id", "ts", "value", "30 minutes").collect()
    assert(out.head.getAs[Double]("sum_value") === 0.3) // not 0.30000000000000004
  }

  test("asofJoin picks the latest right row at-or-before, inclusive on ties") {
    val purchases = events(
      (1L, "2024-01-01 00:10:00", "purchase", 0),
      (1L, "2024-01-01 00:20:00", "purchase", 0),
      (2L, "2024-01-01 00:05:00", "purchase", 0))
      .select($"user_id", $"ts".as("purchase_ts"),
        monotonically_increasing_id().as("pid"))
    val views = Seq(
      (1L, ts("2024-01-01 00:10:00"), 100L), // tie with first purchase -> matches it
      (1L, ts("2024-01-01 00:15:00"), 101L),
      (3L, ts("2024-01-01 00:00:00"), 102L))
      .toDF("user_id", "ts", "view_id")
    val out = Temporal.asofJoin(
        purchases, views, keyCol = "user_id",
        leftTsCol = "purchase_ts", rightTsCol = "ts",
        pickCols = Seq("view_id" -> "view_id", "ts" -> "view_ts"))
      .orderBy($"purchase_ts").collect()
    assert(out.length === 3)
    // ordered by ts: user2@00:05 (no view at all), user1@00:10, user1@00:20
    assert(out(0).isNullAt(out(0).fieldIndex("view_id")))
    assert(out(1).getAs[Long]("view_id") === 100L)      // inclusive tie
    assert(out(2).getAs[Long]("view_id") === 101L)      // latest prior, not first
    assert(out(2).getAs[Timestamp]("view_ts") === ts("2024-01-01 00:15:00"))
  }

  test("asofJoin is a LEFT join: no prior right row yields nulls, rows kept") {
    val purchases = events((2L, "2024-01-01 00:05:00", "purchase", 0))
      .select($"user_id", $"ts".as("purchase_ts"))
    val views = Seq((2L, ts("2024-01-01 00:06:00"), 200L)) // AFTER the purchase
      .toDF("user_id", "ts", "view_id")
    val out = Temporal.asofJoin(
        purchases, views, "user_id", "purchase_ts", "ts",
        Seq("view_id" -> "view_id")).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("view_id")))
  }

  test("asofJoin breaks (key, ts) ties deterministically by the pick struct") {
    val purchases = Seq((1L, ts("2024-01-01 00:10:00")))
      .toDF("user_id", "purchase_ts")
    // two views tied at the same (user, ts): the struct-wise largest
    // pick must win, independent of input/partition order
    val views = Seq(
      (1L, ts("2024-01-01 00:05:00"), 7L),
      (1L, ts("2024-01-01 00:05:00"), 9L))
      .toDF("user_id", "ts", "view_id")
    def run(v: org.apache.spark.sql.DataFrame) = Temporal.asofJoin(
      purchases, v, "user_id", "purchase_ts", "ts", Seq("view_id" -> "view_id"))
      .collect().head.getAs[Long]("view_id")
    assert(run(views) === 9L)
    assert(run(views.orderBy($"view_id".desc)) === 9L)
    assert(run(views.repartition(3)) === 9L)
  }

  test("asofJoin: null join keys never match (SQL equality semantics)") {
    val purchases = Seq(
      (Option.empty[Long], ts("2024-01-01 00:10:00")),
      (Some(1L), ts("2024-01-01 00:10:00")))
      .toDF("user_id", "purchase_ts")
    val views = Seq(
      (Option.empty[Long], ts("2024-01-01 00:01:00"), 50L), // null-key view: dropped
      (Some(1L), ts("2024-01-01 00:02:00"), 51L))
      .toDF("user_id", "ts", "view_id")
    val out = Temporal.asofJoin(
        purchases, views, "user_id", "purchase_ts", "ts",
        Seq("view_id" -> "view_id"))
      .orderBy($"user_id".asc_nulls_first).collect()
    assert(out.length === 2) // left rows always kept
    assert(out(0).isNullAt(out(0).fieldIndex("view_id"))) // null key -> no match
    assert(out(1).getAs[Long]("view_id") === 51L)
  }

  test("asofJoin preserves all left columns and plans without a join operator") {
    val purchases = events((1L, "2024-01-01 00:10:00", "purchase", 7.5))
      .select($"user_id", $"ts".as("purchase_ts"), $"value", $"event_type")
    val views = Seq((1L, ts("2024-01-01 00:01:00"), 300L)).toDF("user_id", "ts", "view_id")
    val df = Temporal.asofJoin(
      purchases, views, "user_id", "purchase_ts", "ts", Seq("view_id" -> "view_id"))
    val row = df.collect().head
    assert(row.getAs[Double]("value") === 7.5)
    assert(row.getAs[String]("event_type") === "purchase")
    assert(row.getAs[Long]("view_id") === 300L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join operator, got:\n$plan")
  }

  test("proximityAgg: inclusive radius, adjacent-bucket matches, zero-match rows kept") {
    val left = events(
      (1L, "2024-01-01 00:01:00", "purchase", 0),
      (2L, "2024-01-01 05:00:00", "purchase", 0)) // nothing near
      .select($"user_id".as("event_id"), $"ts".as("purchase_ts"))
    val right = events(
      (9L, "2024-01-01 00:00:10", "view", 0), // 50s before: bucket b-1 of left
      (9L, "2024-01-01 00:02:00", "view", 0), // EXACTLY 60s after: inclusive
      (9L, "2024-01-01 00:02:01", "view", 0)) // 61s after: out
      .select($"ts")
    val out = Temporal.proximityAgg(
        left, right, Seq("event_id"), "purchase_ts", "ts", radiusSec = 60)
      .orderBy($"event_id").collect()
    assert(out.length === 2) // zero-match left row kept
    assert(out(0).getAs[Long]("n_near") === 2L)
    assert(out(0).getAs[Long]("min_gap_us") === 50000000L) // closest: 50s before
    assert(out(1).getAs[Long]("n_near") === 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("min_gap_us")))
  }

  test("proximityAgg counts each pair once and plans an equi join, not a nested loop") {
    // right row in the SAME bucket as left: still exactly one count even
    // though the left explodes three candidate buckets
    val left = events((1L, "2024-01-01 00:00:30", "purchase", 0))
      .select($"user_id".as("event_id"), $"ts".as("purchase_ts"))
    val right = events((9L, "2024-01-01 00:00:40", "view", 0)).select($"ts")
    val df = Temporal.proximityAgg(
      left, right, Seq("event_id"), "purchase_ts", "ts", radiusSec = 60)
    assert(df.collect().head.getAs[Long]("n_near") === 1L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"expected bucketed equi join, got:\n$plan")
  }

  test("funnelStages counts stages only in order (purchase before view ≠ conversion)") {
    val df = events(
      // user 1: purchase BEFORE the chain, then full view->click->purchase
      (1L, "2024-01-01 00:00:01", "purchase", 1.0),
      (1L, "2024-01-01 00:00:02", "view", 1.0),
      (1L, "2024-01-01 00:00:03", "click", 1.0),
      (1L, "2024-01-01 00:00:04", "purchase", 1.0),
      // user 2: click precedes its view; purchase after an unchained click
      (2L, "2024-01-01 00:00:01", "click", 1.0),
      (2L, "2024-01-01 00:00:02", "view", 1.0),
      (2L, "2024-01-01 00:00:03", "purchase", 1.0),
      // user 3: view then click, no purchase
      (3L, "2024-01-01 00:00:01", "view", 1.0),
      (3L, "2024-01-01 00:00:02", "click", 1.0),
      // user 4: never enters the funnel
      (4L, "2024-01-01 00:00:01", "error", 1.0))
      .withColumn("event_id", monotonically_increasing_id())
    val out = Temporal.funnelStages(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("funnelStagesWithin uses the CLOSEST prior completion, not the first") {
    // view@1, view@51, click@101 with a 60 s horizon: a single-depth
    // greedy that latched onto view@1 would reject the click (100 s
    // later); the window form keeps the running max completion
    // (view@51) and converts. Purchase@700 is beyond horizon of the
    // click -> stage stays 2.
    val df = events(
      (1L, "2024-01-01 00:00:01", "view", 1.0),
      (1L, "2024-01-01 00:00:51", "view", 1.0),
      (1L, "2024-01-01 00:01:41", "click", 1.0),
      (1L, "2024-01-01 00:11:40", "purchase", 1.0))
      .withColumn("event_id", monotonically_increasing_id())
    val out = Temporal.funnelStagesWithin(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"), horizonSec = 60L)
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2))
  }

  test("funnelStagesWithin horizon is inclusive and matches unbounded when huge") {
    val df = events(
      (1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, "2024-01-01 00:01:00", "click", 1.0), // exactly 60 s later
      (2L, "2024-01-01 00:00:00", "view", 1.0),
      (2L, "2024-01-01 00:01:01", "click", 1.0)) // 61 s -> expired
      .withColumn("event_id", monotonically_increasing_id())
    val out = Temporal.funnelStagesWithin(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click"), horizonSec = 60L)
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2, 2L -> 1))
    val unbounded = Temporal.funnelStages(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click")).as[(Long, Int)].collect().toMap
    val huge = Temporal.funnelStagesWithin(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click"), horizonSec = 1000000L).as[(Long, Int)].collect().toMap
    assert(huge == unbounded)
  }

  test("funnelStages: same-row stage cannot satisfy two steps; depth generalizes") {
    // strictly-before frame: a single event is never both the view and
    // the click of its own chain even if types collide in one instant
    val df = events(
      (1L, "2024-01-01 00:00:01", "a", 1.0),
      (1L, "2024-01-01 00:00:01", "b", 1.0), // same ts — id breaks the tie
      (1L, "2024-01-01 00:00:02", "c", 1.0),
      (1L, "2024-01-01 00:00:03", "d", 1.0))
      .withColumn("event_id", monotonically_increasing_id())
    val out = Temporal.funnelStages(df, "user_id", "ts", "event_id", "event_type",
        Seq("a", "b", "c", "d"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 4))
    val single = Temporal.funnelStages(df, "user_id", "ts", "event_id", "event_type",
        Seq("c")).as[(Long, Int)].collect().toMap
    assert(single == Map(1L -> 1))
  }
}
