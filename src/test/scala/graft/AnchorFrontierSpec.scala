package graft

import org.apache.spark.sql.functions._

import graft.ingest.Frontier
import graft.textops.TextAnalysis

/** Round-10 web-signal additions: anchor-text extraction/panel (q164)
  * and frontier priority scoring (q166).
  */
class AnchorFrontierSpec extends SparkSpec {
  import spark.implicits._

  test("anchorEdges: normalization, text-free kept, child-tag and decoys skipped") {
    val pages = Seq(
      (1L, """<a href="https://a.test/x">  Read ME  </a>"""),
      (2L, """<a rel="nofollow" href="https://a.test/x">CLICK Here</a>"""),
      (3L, """<a href="https://b.test/y"></a>"""), // text-free: kept, empty
      (4L, """<a href="https://b.test/y"><b>bold</b></a>"""), // child tag: no anchor row
      (5L, """<a href="/rel">home</a>"""), // relative: kept, host null
      (6L, """<a href="#top">t</a><a href="mailto:a@b">m</a>"""), // non-edges
      (7L, """<a data-href="/decoy">d</a>"""), // decoy: no real href
      (8L, """<A HREF="HTTPS://C.TEST/Z">Caps</A>""")) // case-insensitive tag
      .toDF("id", "page")
    val out = TextAnalysis.anchorEdges(pages, "id", "page")
      .as[(Long, String, String, Option[String])].collect().toSeq.sorted
    assert(out == Seq(
      (1L, "https://a.test/x", "read me", Some("a.test")),
      (2L, "https://a.test/x", "click here", Some("a.test")),
      (3L, "https://b.test/y", "", Some("b.test")),
      (5L, "/rel", "home", None),
      (8L, "HTTPS://C.TEST/Z", "caps", Some("c.test"))))
  }

  test("anchorTextPanel: per (host, anchor) link and distinct-page counts, external only") {
    val pages = Seq(
      (1L, """<a href="https://a.test/x">buy</a><a href="https://a.test/y">buy</a>"""),
      (2L, """<a href="https://a.test/x">buy</a><a href="/rel">buy</a>"""),
      (3L, """<a href="https://a.test/x">news</a>"""))
      .toDF("id", "page")
    val out = TextAnalysis.anchorTextPanel(pages, "id", "page")
      .as[(String, String, Long, Long)].collect().toSeq.sorted
    assert(out == Seq(
      ("a.test", "buy", 3L, 2L), // page 1 said it twice — 3 links, 2 pages
      ("a.test", "news", 1L, 1L)))
  }

  test("prioritize: band law, trap demotion, authority cap, skip rows kept at band 0") {
    val plan = Seq(
      ("https://h1.test/p/1", "h1.test", "new", "fetch"),
      ("https://h1.test/p/2", "h1.test", "stale", "fetch"),
      ("https://h1.test/p/3", "h1.test", "aged", "fetch"),
      ("https://h1.test/p/4", "h1.test", "fresh", "skip"),
      ("https://h2.test/cal/3/4", "h2.test", "new", "fetch"), // trapped template
      ("https://h3.test/p/9", "h3.test", "new", "fetch")) // no in-degree row
      .toDF("loc", "host", "reason", "action")
    val indeg = Seq(("h1.test", 40L), ("h2.test", 7L), ("h9.test", 5000000L))
      .toDF("host", "n_pages")
    val traps = Seq(("h2.test", "/cal/N/N", 1), ("h1.test", "/p/N", 0))
      .toDF("host", "template", "trap")
    val out = Frontier.prioritize(plan, "loc", "host", "reason",
        indeg, "host", "n_pages", traps, "host", "template", "trap")
      .select($"loc", $"authority", $"trapped", $"band", $"priority")
      .as[(String, Long, Int, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("https://h1.test/p/1") == (("https://h1.test/p/1", 40L, 0, 3L, 3000040L)))
    assert(out("https://h1.test/p/2") == (("https://h1.test/p/2", 40L, 0, 2L, 2000040L)))
    assert(out("https://h1.test/p/3") == (("https://h1.test/p/3", 40L, 0, 1L, 1000040L)))
    // skip rows stay, at band 0 (callers filter on action)
    assert(out("https://h1.test/p/4") == (("https://h1.test/p/4", 40L, 0, 0L, 40L)))
    // a flagged (host, template) drops to band 0 even as 'new'
    assert(out("https://h2.test/cal/3/4") == (("https://h2.test/cal/3/4", 7L, 1, 0L, 7L)))
    // host absent from the in-degree panel: authority 0
    assert(out("https://h3.test/p/9") == (("https://h3.test/p/9", 0L, 0, 3L, 3000000L)))
  }

  test("apportion: exact-sum quotas, proportional within one, deterministic ties") {
    val mass = Seq(("a", 5L), ("b", 3L), ("c", 3L), ("d", 1L), ("z", 0L))
      .toDF("host", "mass") // total 12
    val out = Frontier.apportion(mass, "host", "mass", budget = 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out.values.sum == 10L, "quotas must sum to the budget exactly")
    // exact shares: a=4.1(6), b=c=2.5, d=0.8(3), z=0; floors 4,2,2,0,0
    // leftover 2 tops up the largest remainders: d (.83), then the b/c
    // tie (.5) breaks host-asc -> b
    assert(out == Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L, "z" -> 0L))
  }

  test("apportion: budget below host count allocates only top-ups; invariant under partitioning") {
    val mass = (1 to 40).map(i => (f"h$i%02d", i.toLong)).toDF("host", "mass")
    for (parts <- Seq(1, 3, 13)) {
      val out = Frontier.apportion(mass.repartition(parts), "host", "mass", 5L)
        .as[(String, Long, Long)].collect()
      assert(out.map(_._3).sum == 5L)
      assert(out.forall(r => r._3 == 0L || r._3 == 1L))
      // every base floors to 0 (5·40 < 820), so the 5 top-ups go to
      // the largest remainders 5·i — the five largest masses
      val winners = out.filter(_._3 == 1L).map(_._1).sorted.toSeq
      assert(winners == Seq("h36", "h37", "h38", "h39", "h40"),
        s"parts=$parts gave $winners")
    }
  }

  test("scheduleBudgeted: per-host quotas bite; unbudgeted hosts emit nothing; uniform quotas ≡ schedule") {
    val urls = (1L to 20L).map(i => (i, if (i <= 12) "h1" else "h2", i % 7))
      .toDF("id", "host", "priority")
    val delays = Seq(("h1", 100L), ("h2", 200L)).toDF("host", "delay_ms")
    val budgets = Seq(("h1", 3L), ("h2", 0L), ("ghost", 5L))
      .toDF("host", "quota")
    val out = Frontier.scheduleBudgeted(urls, "id", "host", $"priority",
        delays, 1000L, budgets, "host", "quota", hardCap = 100)
      .select($"id", $"host", $"slot", $"fetch_offset_ms")
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(out.forall(_._2 == "h1"), "quota-0 h2 must emit nothing")
    assert(out.length == 3, "h1 fetches exactly its quota")
    assert(out.map(_._4).toSeq == Seq(0L, 100L, 200L), "politeness spacing holds")
    // uniform quotas reproduce the static scheduler exactly
    val uni = Seq(("h1", 4L), ("h2", 4L)).toDF("host", "quota")
    val a = Frontier.scheduleBudgeted(urls, "id", "host", $"priority",
        delays, 1000L, uni, "host", "quota", hardCap = 100)
      .select($"id", $"slot").as[(Long, Long)].collect().toSet
    val b = Frontier.schedule(urls, "id", "host", $"priority",
        delays, 1000L, maxPerHost = 4)
      .select($"id", $"slot").as[(Long, Long)].collect().toSet
    assert(a == b)
    // the hardCap literal is a map-side bound, NOT a semantic one:
    // callers must pass >= max quota (pinned: a low cap clips)
    val clipped = Frontier.scheduleBudgeted(urls, "id", "host", $"priority",
        delays, 1000L, uni, "host", "quota", hardCap = 2)
      .count()
    assert(clipped == 4L)
  }

  test("schedule/scheduleBudgeted: duplicate host rows in a side table are rejected") {
    // enforcement is IN-PLAN since r12 (raise_error on the join key —
    // zero probe jobs), so the dup fails at first EXECUTION rather
    // than at call time, wrapped by Spark's task-failure chain
    def chain(t: Throwable): String = {
      var m = ""
      var c: Throwable = t
      while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
      m
    }
    val urls = Seq((1L, "h1", 1L)).toDF("id", "host", "priority")
    val delays = Seq(("h1", 100L)).toDF("host", "delay_ms")
    val dupDelays = Seq(("h1", 100L), ("h1", 200L)).toDF("host", "delay_ms")
    val dupBudgets = Seq(("h1", 3L), ("h1", 4L)).toDF("host", "quota")
    val e1 = intercept[Exception] {
      Frontier.schedule(urls, "id", "host", $"priority", dupDelays, 1000L, 4)
        .collect()
    }
    assert(chain(e1).contains("delays must have exactly one row per host"))
    val e2 = intercept[Exception] {
      Frontier.scheduleBudgeted(urls, "id", "host", $"priority",
        dupDelays, 1000L, Seq(("h1", 3L)).toDF("host", "quota"),
        "host", "quota", hardCap = 10).collect()
    }
    assert(chain(e2).contains("delays must have exactly one row per host"))
    val e3 = intercept[Exception] {
      Frontier.scheduleBudgeted(urls, "id", "host", $"priority",
        delays, 1000L, dupBudgets, "host", "quota", hardCap = 10).collect()
    }
    assert(chain(e3).contains("budgets must have exactly one row per host"))
    // the dup check must NOT be prunable away: selecting only columns
    // that never touch the side table still trips it (the raise rides
    // the join key, not a payload column)
    val e4 = intercept[Exception] {
      Frontier.schedule(urls, "id", "host", $"priority", dupDelays, 1000L, 4)
        .select($"id").collect()
    }
    assert(chain(e4).contains("one row per host"))
  }

  test("statusTriage: class boundaries, ppm exactness, backoff threshold, out-of-range statuses") {
    val log = Seq(
      ("h1", 200), ("h1", 299), ("h1", 301), ("h1", 404), ("h1", 500),
      ("h2", 200), ("h2", 200), ("h2", 200), ("h2", 200), ("h2", 404),
      ("h3", 0), ("h3", 200)) // a connection-level failure: counted in n only
      .toDF("host", "status")
    val out = Frontier.statusTriage(log, "host", "status", backoffPpm = 250000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getInt(7)))).toMap
    // h1: 5 fetches, 2 ok (200, 299), 1 redirect, 1+1 errors -> 400000 ppm, backoff
    assert(out("h1") == ((5L, 2L, 1L, 1L, 1L, 400000L, 1)))
    // h2: 1/5 errors = 200000 ppm, below the 250000 threshold
    assert(out("h2") == ((5L, 4L, 0L, 1L, 0L, 200000L, 0)))
    // h3: the status-0 row is a fetch but no HTTP class
    assert(out("h3") == ((2L, 1L, 0L, 0L, 0L, 0L, 0)))
  }

  test("apportion: all-zero and negative mass are rejected, not silently NULL") {
    val zero = Seq(("a", 0L), ("b", 0L)).toDF("host", "mass")
    val ex = intercept[IllegalArgumentException] {
      Frontier.apportion(zero, "host", "mass", 10L).collect()
    }
    assert(ex.getMessage.contains("positive mass"))
    val neg = Seq(("a", 5L), ("b", -1L)).toDF("host", "mass")
    val ex2 = intercept[IllegalArgumentException] {
      Frontier.apportion(neg, "host", "mass", 10L).collect()
    }
    assert(ex2.getMessage.contains("non-negative"))
  }

  test("prioritize: an uppercase-scheme loc still resolves its template for trap demotion") {
    val plan = Seq(("HTTP://h2.test/cal/3/4", "h2.test", "new", "fetch"))
      .toDF("loc", "host", "reason", "action")
    val indeg = Seq(("h2.test", 7L)).toDF("host", "n_pages")
    val traps = Seq(("h2.test", "/cal/N/N", 1)).toDF("host", "template", "trap")
    val out = Frontier.prioritize(plan, "loc", "host", "reason",
        indeg, "host", "n_pages", traps, "host", "template", "trap")
      .select($"trapped", $"band").as[(Int, Long)].head()
    assert(out == ((1, 0L)), "scheme case must not defeat the trap join")
  }

  test("prioritize: authority saturates at 999999 so it can never cross bands") {
    val plan = Seq(("https://h9.test/p/1", "h9.test", "aged", "fetch"))
      .toDF("loc", "host", "reason", "action")
    val indeg = Seq(("h9.test", 5000000L)).toDF("host", "n_pages")
    val traps = Seq.empty[(String, String, Int)].toDF("host", "template", "trap")
    val out = Frontier.prioritize(plan, "loc", "host", "reason",
        indeg, "host", "n_pages", traps, "host", "template", "trap")
      .select($"authority", $"priority").as[(Long, Long)].head()
    assert(out == ((999999L, 1999999L)))
  }
}
