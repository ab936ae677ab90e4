package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.Frontier
import graft.streaming.StreamCrawlControl

/** The crawl control loop: streamed panel ≡ batch statusTriage over
  * any split (unconditional — counters merge exactly), backoff hosts
  * excluded from the next wave, quota law ≡ the batch composition,
  * paused-crawler empty waves, durable restart/replay idempotency.
  */
class StreamCrawlControlSpec extends SparkSpec {
  import spark.implicits._

  private val delays = Seq(("good.test", 100L), ("flaky.test", 100L),
    ("dead.test", 100L)).toDF("host", "delay_ms")

  /** fetch log rows: good.test all 200s, flaky.test hovering at the
    * threshold, dead.test mostly 5xx.
    */
  private def logRows(n: Int, offset: Int = 0): DataFrame =
    (0 until n).flatMap { i =>
      val k = i + offset
      Seq(
        ("good.test", 200),
        ("flaky.test", if (k % 3 == 0) 500 else 200),
        ("dead.test", if (k % 4 == 0) 200 else 503))
    }.toDF("host", "status")

  private def urls(perHost: Int): DataFrame =
    (0 until perHost).flatMap { i =>
      Seq((100L + i, "good.test", 50L - i), (200L + i, "flaky.test", 50L - i),
        (300L + i, "dead.test", 50L - i))
    }.toDF("id", "host", "priority")

  private def triSet(df: DataFrame) =
    df.select($"host", $"n_fetches", $"n_2xx", $"n_3xx", $"n_4xx", $"n_5xx",
        $"error_ppm", $"backoff")
      .as[(String, Long, Long, Long, Long, Long, Long, Int)].collect().toSet

  test("streamed panel ≡ batch statusTriage over the union, any split") {
    val full = logRows(24)
    val batchTriage = triSet(Frontier.statusTriage(full, "host", "status",
      backoffPpm = 500000L))
    for (split <- Seq(Seq(24), Seq(1, 23), Seq(8, 8, 8), Seq(5, 7, 3, 9))) {
      val s = new StreamCrawlControl.ControlSession("host", "status")
      var off = 0
      split.foreach { n => s.ingest(logRows(n, off)); off += n }
      val streamed = triSet(
        StreamCrawlControl.triageOf(s.currentPanel, 500000L))
      assert(streamed == batchTriage, s"split=$split")
    }
  }

  test("backoff host gets zero quota; wave ≡ the batch composition") {
    val s = new StreamCrawlControl.ControlSession("host", "status")
    s.ingest(logRows(12)) // dead.test at 75% errors → backoff at 50%
    val wave = s.nextWave(backoffPpm = 500000L, urls(6), "id", "host",
      $"priority", delays, 1000L, budget = 8L, hardCap = 100)
    val byHost = wave.groupBy($"host").count()
      .as[(String, Long)].collect().toMap
    assert(!byHost.contains("dead.test"), s"backoff host must fetch nothing: $byHost")
    assert(byHost.values.sum == 8L, "the wave budget is consumed exactly")
    // batch composition from the same union log: identical wave
    val tri = Frontier.statusTriage(logRows(12), "host", "status", 500000L)
    val mass = tri.filter($"backoff" === 0 && $"n_2xx" > 0)
      .select($"host", $"n_2xx".as("mass"))
    val budgets = Frontier.apportion(mass, "host", "mass", 8L)
      .select($"host", $"quota")
    val batchWave = Frontier.scheduleBudgeted(urls(6), "id", "host",
      $"priority", delays, 1000L, budgets, "host", "quota", 100)
    val key = (df: DataFrame) => df.select($"id", $"slot", $"fetch_offset_ms")
      .as[(Long, Long, Long)].collect().toSet
    assert(key(wave) == key(batchWave))
    // quotas follow success mass: good.test (12 of 20 successes) gets more
    assert(byHost("good.test") > byHost("flaky.test"))
  }

  test("recovery closes the loop: a backoff host earns quota back") {
    val s = new StreamCrawlControl.ControlSession("host", "status")
    s.ingest(logRows(12))
    val w1 = s.nextWave(500000L, urls(6), "id", "host", $"priority",
      delays, 1000L, 8L, 100)
    assert(w1.filter($"host" === "dead.test").count() == 0L)
    // dead.test turns healthy: a long run of 200s dilutes its ratio
    s.ingest(Seq.fill(60)(("dead.test", 200)).toDF("host", "status"))
    val w2 = s.nextWave(500000L, urls(6), "id", "host", $"priority",
      delays, 1000L, 8L, 100)
    assert(w2.filter($"host" === "dead.test").count() > 0L,
      "recovered host must re-enter the wave")
  }

  test("all hosts backoff → empty wave, not an exception") {
    val s = new StreamCrawlControl.ControlSession("host", "status")
    s.ingest(Seq(("a.test", 500), ("b.test", 503)).toDF("host", "status"))
    val w = s.nextWave(500000L, urls(2), "id", "host", $"priority",
      delays, 1000L, 8L, 100)
    assert(w.count() == 0L)
    assert(w.columns.contains("fetch_offset_ms"), "schema intact on empty")
  }

  test("durable session: restart re-derives the panel; replay is idempotent") {
    val path = Files.createTempDirectory("crawlctl").toFile.getAbsolutePath
    val s1 = new StreamCrawlControl.DurableControlSession(spark, path)
    s1.ingest(logRows(8), batchId = 0L)
    s1.ingest(logRows(8, offset = 8), batchId = 1L)
    val before = triSet(StreamCrawlControl.triageOf(s1.currentPanel, 500000L))
    // replay of batch 1 (same id): first-writer-wins, panel unchanged
    s1.ingest(logRows(8, offset = 8), batchId = 1L)
    assert(triSet(StreamCrawlControl.triageOf(s1.currentPanel, 500000L)) == before)
    // restart: a fresh session over the same path sees the same panel
    val s2 = new StreamCrawlControl.DurableControlSession(spark, path)
    assert(triSet(StreamCrawlControl.triageOf(s2.currentPanel, 500000L)) == before)
    // and equals the batch derivation over the union
    val union = logRows(8).unionByName(logRows(8, offset = 8))
    assert(before == triSet(
      Frontier.statusTriage(union, "host", "status", 500000L)))
    // waves from restarted state match
    val w1 = s1.nextWave(500000L, urls(4), "id", "host", $"priority",
      delays, 1000L, 6L, 100).select($"id", $"slot")
      .as[(Long, Long)].collect().toSet
    val w2 = s2.nextWave(500000L, urls(4), "id", "host", $"priority",
      delays, 1000L, 6L, 100).select($"id", $"slot")
      .as[(Long, Long)].collect().toSet
    assert(w1 == w2)
  }

  test("panelSlice prunes batch directories by host stats, identical results") {
    val path = Files.createTempDirectory("crawlctl").toFile.getAbsolutePath
    val s = new StreamCrawlControl.DurableControlSession(spark, path)
    def log(host: String) = Seq((host, 200), (host, 503), (host, 200))
      .toDF("host", "status")
    s.ingest(log("apple.test"), 0L)
    s.ingest(log("mango.test"), 1L)
    s.ingest(log("zebra.test"), 2L)
    def dirs(df: DataFrame): Set[String] =
      df.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).toSet
    val slice = s.panelSlice("a", "b")
    assert(dirs(slice).size == 1,
      s"mango/zebra batch dirs must be stats-pruned: ${dirs(slice)}")
    def rows(df: DataFrame) =
      df.select($"host", $"n_fetches", $"n_2xx", $"n_5xx")
        .as[(String, Long, Long, Long)].collect().toSet
    assert(rows(slice) ==
      rows(s.currentPanel.filter($"host" >= "a" && $"host" <= "b")))
    // after compaction: batches 0-1 fold into a segment carrying
    // merged stats (apple..mango); batch 2 stays live. A high-range
    // slice must skip the segment, a low-range one must skip batch 2,
    // and both must equal the full-fold + filter derivation.
    assert(s.compactNow() == 2)
    val hi = s.panelSlice("z", "zz")
    assert(dirs(hi).size == 1, s"segment must be stats-pruned: ${dirs(hi)}")
    assert(rows(hi) ==
      rows(s.currentPanel.filter($"host" >= "z" && $"host" <= "zz")))
    val lo = s.panelSlice("a", "n")
    assert(dirs(lo).size == 1, s"live batch 2 must be stats-pruned: ${dirs(lo)}")
    assert(rows(lo) ==
      rows(s.currentPanel.filter($"host" >= "a" && $"host" <= "n")))
  }

  test("durable session compacts without changing the panel") {
    val path = Files.createTempDirectory("crawlctl").toFile.getAbsolutePath
    val s = new StreamCrawlControl.DurableControlSession(spark, path,
      compactEvery = 2)
    (0L to 4L).foreach(b => s.ingest(logRows(4, offset = 4 * b.toInt), b))
    val got = triSet(StreamCrawlControl.triageOf(s.currentPanel, 500000L))
    val union = (0 to 4).map(b => logRows(4, offset = 4 * b))
      .reduce(_ unionByName _)
    assert(got == triSet(
      Frontier.statusTriage(union, "host", "status", 500000L)))
  }
}
