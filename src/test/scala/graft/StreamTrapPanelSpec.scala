package graft

import org.apache.spark.sql.functions._

import graft.ingest.Frontier
import graft.streaming.StreamTrapPanel

/** The sketched trap panel: streamed ≡ batch bit-for-bit (counts fold
  * by sum, HLL registers by max — both order-free), the estimate
  * tracks the exact panel's cardinality closely enough to make the
  * same trap calls, and state is summary-sized by construction.
  */
class StreamTrapPanelSpec extends SparkSpec {
  import spark.implicits._

  // h1: a calendar generator (one template, 400 distinct URLs) plus a
  // small static set; h2: one popular static page + a hex-id class
  private def urls = (
    (1 to 400).map(i => ("h1", s"/cal/2026/${i % 28 + 1}/$i")) ++
    (1 to 40).map(_ => ("h1", "/about")) ++
    (1 to 300).map(_ => ("h2", "/home")) ++
    (1 to 60).map(i => ("h2", s"/id/${"%032x".format(i)}"))
  ).toDF("host", "path")

  test("streamed ≡ batch sketched panel under random batching") {
    val batch = StreamTrapPanel.trapPanelSketched(urls, "host", "path",
        sharePct = 50, minPathsEst = 20)
      .orderBy("host", "template").collect().toSeq
    val session = new StreamTrapPanel.TrapPanelSession(spark, "host", "path",
      sharePct = 50, minPathsEst = 20)
    val rnd = new scala.util.Random(5)
    val rows = urls.collect().toSeq
    rows.groupBy(_ => rnd.nextInt(7)).values.foreach { b =>
      session.ingest(b.map(r => (r.getString(0), r.getString(1)))
        .toDF("host", "path"))
    }
    assert(session.currentPanel.orderBy("host", "template").collect().toSeq
      === batch)
  }

  test("sketched estimates track the exact panel; trap calls agree") {
    val exact = Frontier.trapPanel(urls, "host", "path",
        sharePct = 50, minPaths = 20)
      .select($"host", $"template", $"n_paths", $"trap")
      .as[(String, String, Long, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val sk = StreamTrapPanel.trapPanelSketched(urls, "host", "path",
        sharePct = 50, minPathsEst = 20)
      .select($"host", $"template", $"n_paths_est", $"trap")
      .as[(String, String, Long, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(sk.keySet == exact.keySet)
    exact.foreach { case (key, (nExact, trapExact)) =>
      val (nEst, trapEst) = sk(key)
      // p = 12 → ±~1.6% standard error; allow 10% on a 400-point set
      assert(math.abs(nEst - nExact) <= math.max(2L, nExact / 10),
        s"$key: est $nEst vs exact $nExact")
      assert(trapEst == trapExact, s"$key: trap disagreement")
    }
    // the calls the fixture was built to pin
    assert(sk(("h1", "/cal/N/N/N"))._2 == 1, "the generator is flagged")
    assert(sk(("h2", "/home"))._2 == 0, "popular static is not")
    assert(sk(("h2", "/id/H"))._2 == 0, "sub-share id class is not")
  }

  test("register state is summary-sized: bounded by (host·template) × 2^p") {
    val session = new StreamTrapPanel.TrapPanelSession(spark, "host", "path",
      sharePct = 50, minPathsEst = 20, p = 6)
    session.ingest(urls)
    val nTemplates = 4 // (h1 cal, h1 about, h2 home, h2 id)
    val cap = nTemplates * (1 << 6)
    val afterOne = session.currentRegisters.count()
    assert(afterOne <= cap,
      s"register state $afterOne exceeds the (host·template)×2^p bound $cap")
    // a duplicate ingest of 800 rows must not grow the register state
    // AT ALL (max-fold idempotent) while counts double (sum additive)
    session.ingest(urls)
    assert(session.currentRegisters.count() == afterOne)
    val panel = session.currentPanel.collect()
    assert(panel.length == nTemplates)
    val doubled = panel.map(r =>
      (r.getAs[String]("host"), r.getAs[String]("template")) ->
        r.getAs[Long]("n_urls")).toMap
    assert(doubled(("h1", "/cal/N/N/N")) == 800L)
  }
}
