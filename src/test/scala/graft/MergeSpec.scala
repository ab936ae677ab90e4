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
}
