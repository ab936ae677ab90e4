package graft

import org.apache.spark.sql.functions._

import graft.plans.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: last writer wins per key, unmatched inserts") {
    val existing = Seq(("a.com", "old", 1), ("b.com", "keep", 1)).toDF("etld1", "v", "n")
    val updates = Seq(("a.com", "new", 2), ("c.com", "ins", 1)).toDF("etld1", "v", "n")
    val out = Merge.upsert(existing, updates, "etld1")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a.com" -> "new", "b.com" -> "keep", "c.com" -> "ins"))
  }

  test("upsertLatest: highest version wins; replay is a no-op") {
    val existing = Seq(("a.com", "v2", 2), ("b.com", "v5", 5)).toDF("etld1", "v", "ver")
    val updates = Seq(("a.com", "v3", 3), ("b.com", "v4", 4)).toDF("etld1", "v", "ver")
    val once = Merge.upsertLatest(existing, updates, "etld1", "ver")
    val onceMap = once.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(onceMap == Map("a.com" -> "v3", "b.com" -> "v5")) // stale v4 ignored
    val twice = Merge.upsertLatest(once, updates, "etld1", "ver")
    assert(twice.collect().map(r => r.getString(0) -> r.getString(1)).toMap == onceMap)
  }

  test("validity gates match the reference thresholds") {
    val rows = Seq(
      (100, 9, 1, false, true),   // healthy
      (20, 9, 1, false, false),   // too few tokens
      (100, 7, 3, false, false),  // success rate 0.7
      (100, 9, 1, true, false),   // timed out
      (31, 0, 0, false, false))   // no urls attempted → rate 0.0 → invalid
      .toDF("tokens", "ok", "fail", "timeout", "want")
    val got = rows.withColumn("valid",
      Merge.scrapeValid($"tokens", $"ok", $"fail", $"timeout"))
    got.collect().foreach { r =>
      assert(r.getAs[Boolean]("valid") == r.getAs[Boolean]("want"), r.toString)
    }
    val sizes = Seq((50, false), (51, true), (124999, true), (125000, false))
      .toDF("tokens", "want")
      .withColumn("valid", Merge.docSizeValid($"tokens"))
    sizes.collect().foreach { r =>
      assert(r.getAs[Boolean]("valid") == r.getAs[Boolean]("want"), r.toString)
    }
  }

  private def hist(rows: (String, String, Long, Option[Long])*) =
    rows.toDF("etld1", "status", "valid_from", "valid_to")

  private def ups(rows: (String, String, Long)*) = rows.toDF("etld1", "status", "ts")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, Long, Option[Long])].collect().toSet

  test("scd2Apply: a changed attribute closes the open row and opens a new one") {
    val history = hist(("a.com", "active", 10L, None))
    val out = Merge.scd2Apply(history, ups(("a.com", "dormant", 20L)),
      "etld1", Seq("status"), "ts")
    assert(snap(out) == Set(
      ("a.com", "active", 10L, Some(20L)),
      ("a.com", "dormant", 20L, None)))
  }

  test("scd2Apply: no-op updates are dropped and replay is idempotent") {
    val history = hist(("a.com", "active", 10L, None), ("b.com", "old", 1L, Some(5L)))
    val updates = ups(("a.com", "active", 20L), ("a.com", "dormant", 30L))
    val once = Merge.scd2Apply(history, updates, "etld1", Seq("status"), "ts")
    assert(snap(once) == Set(
      ("b.com", "old", 1L, Some(5L)),          // closed history untouched
      ("a.com", "active", 10L, Some(30L)),     // equal update at 20 ignored
      ("a.com", "dormant", 30L, None)))
    val twice = Merge.scd2Apply(once, updates, "etld1", Seq("status"), "ts")
    assert(snap(twice) == snap(once))
  }

  test("scd2Apply: several updates per key chain intervals in ts order") {
    val out = Merge.scd2Apply(
      hist(), ups(("n.com", "s1", 10L), ("n.com", "s2", 20L), ("n.com", "s3", 30L)),
      "etld1", Seq("status"), "ts")
    assert(snap(out) == Set(
      ("n.com", "s1", 10L, Some(20L)),
      ("n.com", "s2", 20L, Some(30L)),
      ("n.com", "s3", 30L, None)))
  }

  test("scd2Apply: conflicting same-ts updates resolve to the greatest tuple, idempotently") {
    val updates = ups(("k.com", "aaa", 20L), ("k.com", "zzz", 20L))
    val once = Merge.scd2Apply(hist(), updates, "etld1", Seq("status"), "ts")
    assert(snap(once) == Set(("k.com", "zzz", 20L, None)))
    val twice = Merge.scd2Apply(once, updates, "etld1", Seq("status"), "ts")
    assert(snap(twice) == snap(once))
  }

  test("scd2Apply: a key with only closed rows rejects retroactive updates") {
    val history = hist(("c.com", "active", 10L, Some(50L)))
    // ts=30 falls inside the closed interval -> dropped, never reopens
    val inside = Merge.scd2Apply(history, ups(("c.com", "dormant", 30L)),
      "etld1", Seq("status"), "ts")
    assert(snap(inside) == Set(("c.com", "active", 10L, Some(50L))))
    // ts=50 (at the close boundary) legitimately resumes the history
    val resume = Merge.scd2Apply(history, ups(("c.com", "dormant", 50L)),
      "etld1", Seq("status"), "ts")
    assert(snap(resume) == Set(
      ("c.com", "active", 10L, Some(50L)),
      ("c.com", "dormant", 50L, None)))
  }

  test("scd2Apply: applying time-ordered batches split or combined gives one history") {
    // the CDC invariant incremental appliers rely on: as long as batch
    // boundaries respect event-time order, HOW updates are batched
    // cannot change the merged history
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val updates = (1 to 40).map { i =>
        (s"k${rnd.nextInt(4)}.com", s"s${rnd.nextInt(3)}", i.toLong * 10)
      }
      val cut = 10 + rnd.nextInt(20)
      val (b1, b2) = updates.splitAt(cut) // ts-ordered, so every b2 ts > every b1 ts
      val combined = Merge.scd2Apply(hist(), ups(updates: _*), "etld1", Seq("status"), "ts")
      val split = Merge.scd2Apply(
        Merge.scd2Apply(hist(), ups(b1: _*), "etld1", Seq("status"), "ts"),
        ups(b2: _*), "etld1", Seq("status"), "ts")
      assert(snap(split) == snap(combined), s"trial $trial diverged at cut $cut")
    }
  }

  test("scd2Apply: new keys insert as open rows; multiple attrs compare as a struct") {
    val history = hist()
    val updates = Seq(("x.com", "a", 1, 100L), ("x.com", "a", 2, 200L))
      .toDF("etld1", "status", "tier", "ts")
    val out = Merge.scd2Apply(history.withColumn("tier", lit(0)).limit(0),
      updates, "etld1", Seq("status", "tier"), "ts")
    val rows = out.as[(String, String, Int, Long, Option[Long])].collect().toSet
    assert(rows == Set(
      ("x.com", "a", 1, 100L, Some(200L)),   // tier change alone reopens
      ("x.com", "a", 2, 200L, None)))
  }
}
