package graft

import graft.streaming.StreamDistinctCount

/** Maintained HLL distinct counts: the envelope contract — estimates
  * stay within the published error bound of exact counts under ANY
  * batching, replay, restart, and compaction. (Bit-equality with the
  * single-shot sketch does NOT hold in general: below ~k distinct
  * values DataSketches sits in an exact list/set mode and a union
  * promotes to estimating HLL mode — the spec pins the honest
  * envelope instead.)
  */
class StreamDistinctCountSpec extends SparkSpec {
  import spark.implicits._

  private val Envelope = 0.05

  // (stratum, value) rows with known per-stratum distinct counts
  private def rows: Seq[(String, String)] = {
    val a = (1 to 900).map(i => ("a", s"u${i % 450}"))   // 450 distinct
    val b = (1 to 300).map(i => ("b", s"v$i"))           // 300 distinct
    val c = Seq(("c", "only"))                           // 1 distinct
    a ++ b ++ c
  }

  private val Exact = Map("a" -> 450.0, "b" -> 300.0, "c" -> 1.0)

  private def estimatesOf(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.as[(String, Double)].collect().toMap

  private def assertEnvelope(est: Map[String, Double]): Unit =
    for ((k, e) <- Exact)
      assert(math.abs(est(k) - e) / e <= Envelope, s"stratum $k: ${est(k)} vs $e")

  test("single-shot estimates are within the published HLL envelope") {
    assertEnvelope(estimatesOf(
      StreamDistinctCount.distinctSketches(rows.toDF("stratum", "v"), "stratum", "v")
        .select($"stratum", $"estimate")))
  }

  test("estimates stay in the envelope under any batching") {
    val all = rows
    for (parts <- Seq(2, 5)) {
      val session = new StreamDistinctCount.DistinctCountSession(spark, "stratum", "v")
      var last: Map[String, Double] = Map.empty
      all.grouped((all.size + parts - 1) / parts).foreach { b =>
        last = estimatesOf(session.ingest(b.toDF("stratum", "v")))
      }
      assertEnvelope(last)
    }
  }

  test("replaying a batch keeps estimates in the envelope and re-replay is stable") {
    val all = rows
    val session = new StreamDistinctCount.DistinctCountSession(spark, "stratum", "v")
    val half = all.take(all.size / 2)
    val exactHalf = half.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toDouble).toMap
    def check(est: Map[String, Double]): Unit =
      for ((k, e) <- exactHalf)
        assert(math.abs(est(k) - e) / e <= Envelope, s"stratum $k: ${est(k)} vs $e")
    check(estimatesOf(session.ingest(half.toDF("stratum", "v"))))
    // replay cannot inflate past the envelope (register-max, not addition)
    val second = estimatesOf(session.ingest(half.toDF("stratum", "v")))
    check(second)
    // once the state is in union (HLL) mode, a further replay is a no-op
    val third = estimatesOf(session.ingest(half.toDF("stratum", "v")))
    assert(third === second)
  }

  test("durable session: restart resumes, replay overwrites, compaction stable") {
    val dir = java.nio.file.Files.createTempDirectory("distinctcount").toString
    val all = rows
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val s1 = new StreamDistinctCount.DurableDistinctCountSession(
      spark, dir, "stratum", "v", compactEvery = 2)
    batches.zipWithIndex.foreach { case (b, i) =>
      s1.ingest(b.toDF("stratum", "v"), i.toLong)
    }
    assertEnvelope(estimatesOf(s1.estimates))
    // replay the last batch: the directory is overwritten with the
    // identical sketch rows — the folded estimate cannot change
    val before = estimatesOf(s1.estimates)
    s1.ingest(batches.last.toDF("stratum", "v"), (batches.size - 1).toLong)
    assert(estimatesOf(s1.estimates) === before)
    // restart reads the same committed rows
    val s2 = new StreamDistinctCount.DurableDistinctCountSession(spark, dir, "stratum", "v")
    assert(estimatesOf(s2.estimates) === before)
  }
}
