package graft

import org.apache.spark.sql.functions._

import graft.ingest.Robots

/** robots.txt subset semantics (RFC 9309): grouping, agent precedence,
  * the group-merge rule, longest-match with Allow tie, and the parser's
  * garbage tolerance.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val policy =
    """# top comment
      |Disallow: /unreachable
      |User-agent: *
      |Disallow: /a
      |Allow: /a/ok
      |Crawl-delay: 10
      |
      |User-agent: MyBot
      |User-agent: other
      |Disallow: /b
      |Disallow:
      |
      |User-agent: mybot
      |Allow: /b/ok
      |""".stripMargin

  private def robots(hosts: String*) =
    hosts.map(h => (h, policy)).toDF("host", "txt")

  test("ruleTable: groups, multi-agent headers, pre-group and empty-value drops") {
    val t = Robots.ruleTable(robots("h1"), "host", "txt")
      .as[(String, Long, String, String, Int)].collect().toSet
    assert(t == Set(
      ("h1", 1L, "*", "/a", 0), ("h1", 1L, "*", "/a/ok", 1),
      ("h1", 2L, "mybot", "/b", 0), ("h1", 2L, "other", "/b", 0),
      ("h1", 3L, "mybot", "/b/ok", 1)))
  }

  test("effectiveRules: exact agent shadows *, groups at same precedence merge") {
    val eff = Robots.effectiveRules(robots("h1"), "host", "txt", "MYBOT")
      .as[(String, String, Int)].collect().toSet
    // both mybot groups merge; the * group is shadowed entirely
    assert(eff == Set(("h1", "/b", 0), ("h1", "/b/ok", 1)))
    val star = Robots.effectiveRules(robots("h1"), "host", "txt", "strangerbot")
      .as[(String, String, Int)].collect().toSet
    assert(star == Set(("h1", "/a", 0), ("h1", "/a/ok", 1)))
  }

  test("effectiveRules: longest token-boundary prefix wins (googlebot-news rule)") {
    val txt =
      """User-agent: *
        |Disallow: /star
        |User-agent: mybot
        |Disallow: /base
        |User-agent: mybot-news
        |Disallow: /news
        |""".stripMargin
    val r = Seq(("h", txt)).toDF("host", "txt")
    def eff(caller: String) =
      Robots.effectiveRules(r, "host", "txt", caller)
        .as[(String, String, Int)].collect().map(_._2).toSet
    assert(eff("MyBot-News") == Set("/news"), "exact beats shorter prefix")
    assert(eff("mybot-news-eu") == Set("/news"), "longest prefix wins")
    assert(eff("mybot-video") == Set("/base"), "prefix group when no exact")
    assert(eff("my") == Set("/star"), "'my' is NOT under 'mybot' — boundary")
    assert(eff("mybotx") == Set("/star"), "no token boundary, no match")
    // crawlDelays uses the same precedence
    val dtxt = "User-agent: *\nCrawl-delay: 9\nUser-agent: mybot\nCrawl-delay: 1\n"
    val d = Robots.crawlDelays(Seq(("h", dtxt)).toDF("host", "txt"),
      "host", "txt", "mybot-news").as[(String, Long)].collect().toMap
    assert(d("h") == 1000L, "prefix group's delay, not *'s")
  }

  test("allowed: longest prefix wins, Allow wins ties, no match allows") {
    val urls = Seq(
      (1L, "h1", "/b/page"),      // /b disallow
      (2L, "h1", "/b/ok/page"),   // /b/ok allow beats /b by length
      (3L, "h1", "/a/anything"),  // * group shadowed -> no rule -> allow
      (4L, "h1", "/c"),           // no rule
      (5L, "h1", "/b")).toDF("id", "host", "path")
    val out = Robots.allowed(urls, "id", "host", "path",
        robots("h1"), "host", "txt", "MyBot")
      .select($"id", $"allowed", $"rule")
      .as[(Long, Int, Option[String])].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(1L) == ((0, Some("/b"))))
    assert(out(2L) == ((1, Some("/b/ok"))))
    assert(out(3L) == ((1, None)))
    assert(out(4L) == ((1, None)))
    assert(out(5L) == ((0, Some("/b"))))
  }

  test("allowed: Allow/Disallow of the SAME path — Allow wins the tie") {
    val tie = Seq(("h1",
      "User-agent: *\nDisallow: /x\nAllow: /x\n")).toDF("host", "txt")
    val urls = Seq((1L, "h1", "/x/q")).toDF("id", "host", "path")
    val out = Robots.allowed(urls, "id", "host", "path", tie, "host", "txt", "any")
      .select($"allowed").as[Int].head()
    assert(out == 1)
  }

  test("allowed: hosts missing a robots file allow everything") {
    val urls = Seq((1L, "nofile.test", "/a/x")).toDF("id", "host", "path")
    val out = Robots.allowed(urls, "id", "host", "path",
        robots("h1"), "host", "txt", "MyBot")
      .select($"allowed").as[Int].head()
    assert(out == 1)
  }

  test("crawlDelays: precedence, fractional seconds, conflict-max, non-numeric drop") {
    val txt =
      """User-agent: *
        |Crawl-delay: 2
        |User-agent: MyBot
        |Crawl-delay: 0.5
        |User-agent: mybot
        |Crawl-delay: 1
        |User-agent: junk
        |Crawl-delay: soon
        |""".stripMargin
    val robots = Seq(("h1", txt), ("h2", "User-agent: *\nCrawl-delay: 3\n"),
      ("h3", "User-agent: *\nDisallow: /x\n"),
      ("h4", "User-agent: *\nCrawl-delay: 2.9\n")).toDF("host", "txt")
    val d = Robots.crawlDelays(robots, "host", "txt", "MyBot")
      .as[(String, Long)].collect().toMap
    // exact groups shadow *; two exact groups conflict -> max(500, 1000)
    assert(d("h1") == 1000L)
    assert(d("h2") == 3000L, "star fallback")
    assert(!d.contains("h3"), "no delay parsed -> absent, caller default")
    // 2.9 × 1000 = 2899.999… in IEEE — the explicit round() must emit
    // 2900 (a bare long cast truncates to 2899, the r9 ADVICE trap)
    assert(d("h4") == 2900L, "fractional delay rounds, never truncates")
    val junk = Robots.crawlDelays(robots, "host", "txt", "junk")
      .as[(String, Long)].collect().toMap
    // the junk group NAMES the caller, so it wins precedence even
    // though its delay value is garbage: no valid delay in the winning
    // group means ABSENT (caller default) — never a fallback to *'s
    // (precedence is computed over ALL matching groups, RFC 9309)
    assert(!junk.contains("h1"),
      "caller-named group with unparseable delay -> absent, not *'s")
  }

  test("a caller-named group with only Crawl-delay wins: allow-all, its delay") {
    val txt = "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n" +
      "User-agent: mybot\nCrawl-delay: 4\n"
    val r = Seq(("h", txt)).toDF("host", "txt")
    // the mybot group carries no Allow/Disallow: it still wins the
    // agent precedence (RFC 9309 — * applies only when NO group names
    // the caller), and an empty winning rule set means allow-all
    assert(Robots.effectiveRules(r, "host", "txt", "MyBot").count() == 0)
    val urls = Seq((1L, "h", "/private/x")).toDF("id", "host", "path")
    val mine = Robots.allowed(urls, "id", "host", "path", r, "host", "txt", "MyBot")
      .select($"allowed").as[Int].head()
    assert(mine == 1, "winning empty group = allow-all, not *'s rules")
    val d = Robots.crawlDelays(r, "host", "txt", "MyBot")
      .as[(String, Long)].collect().toMap
    assert(d("h") == 4000L, "the winning group's delay, not *'s")
    // a stranger still falls back to the * group's rules
    val stranger = Robots.allowed(urls, "id", "host", "path", r, "host", "txt", "stranger")
      .select($"allowed").as[Int].head()
    assert(stranger == 0)
  }

  test("allowed: RFC 9309 * and $ patterns — mid wildcard, end anchor, escaped metas") {
    val txt = "User-agent: *\nDisallow: /p/*1\nDisallow: /*.php$\n" +
      "Allow: /a/ok$\nDisallow: /a\nDisallow: /q.x*\n"
    val r = Seq(("h", txt)).toDF("host", "txt")
    val urls = Seq(
      (1L, "h", "/p/31"),     // mid wildcard: ^/p/.*1 matches
      (2L, "h", "/p/3"),      // no 1 after /p/ -> no match
      (3L, "h", "/x/y.php"),  // /*.php$ anchors and matches
      (4L, "h", "/x/y.phpx"), // anchor rejects the longer path
      (5L, "h", "/a/ok"),     // Allow /a/ok$ (len 6) beats Disallow /a (len 2)
      (6L, "h", "/a/okz"),    // anchor rejects the Allow; /a disallows
      (7L, "h", "/q.xz"),     // /q.x* regex path: literal dot escaped
      (8L, "h", "/qzxz"))     // the escaped dot must NOT match 'z'
      .toDF("id", "host", "path")
    val out = Robots.allowed(urls, "id", "host", "path", r, "host", "txt", "any")
      .select($"id", $"allowed", $"rule")
      .as[(Long, Int, Option[String])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(out(1L) == ((0, Some("/p/*1"))))
    assert(out(2L) == ((1, None)))
    assert(out(3L) == ((0, Some("/*.php$"))))
    assert(out(4L) == ((1, None)))
    assert(out(5L) == ((1, Some("/a/ok$"))))
    assert(out(6L) == ((0, Some("/a"))))
    assert(out(7L) == ((0, Some("/q.x*"))))
    assert(out(8L) == ((1, None)))
  }

  test("Frontier.schedule: per-host slots by priority, budget cap, default delay") {
    import graft.ingest.Frontier
    val urls = Seq(
      (1L, "a", 5L), (2L, "a", 9L), (3L, "a", 9L), (4L, "a", 1L),
      (5L, "b", 7L)).toDF("id", "host", "priority")
    val delays = Seq(("a", 200L)).toDF("host", "delay_ms")
    val out = Frontier.schedule(urls, "id", "host", $"priority",
        delays, defaultDelayMs = 1000L, maxPerHost = 3)
      .select($"id", $"slot", $"delay_ms", $"fetch_offset_ms")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // host a: priority desc, id asc -> 2, 3, 1, (4 over budget)
    assert(out(2L) == ((2L, 0L, 200L, 0L)))
    assert(out(3L) == ((3L, 1L, 200L, 200L)))
    assert(out(1L) == ((1L, 2L, 200L, 400L)))
    assert(!out.contains(4L), "budget cap drops the lowest priority")
    assert(out(5L) == ((5L, 0L, 1000L, 0L)), "absent host gets the default delay")
  }

  test("trapPanel: calendar trap flagged, popular static and hex ids are not") {
    import graft.ingest.Frontier
    val urls = (
      // h1: a calendar trap — one template, many distinct URLs
      (1 to 40).map(i => ("h1", s"/cal/2026/$i")) ++
      (1 to 8).map(_ => ("h1", "/about")) ++
      // h2: one POPULAR static page (cardinality 1 — not a trap) plus
      // a below-share hex-id class exercising the H fold
      (1 to 40).map(_ => ("h2", "/home")) ++
      (1 to 10).map(i => ("h2", s"/id/${"%032x".format(i)}"))
    ).toDF("host", "path")
    val out = Frontier.trapPanel(urls, "host", "path", sharePct = 50, minPaths = 10)
      .select($"host", $"template", $"n_urls", $"n_paths", $"share_pct", $"trap")
      .as[(String, String, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(("h1", "/cal/N/N")) == ((40L, 40L, 83L, 1)), "the trap")
    assert(out(("h1", "/about")) == ((8L, 1L, 16L, 0)))
    // 40/50 = 80% share but cardinality 1: a popular page, not a trap
    assert(out(("h2", "/home")) == ((40L, 1L, 80L, 0)))
    // hex ids fold to one template; 20% share keeps it under the bar
    assert(out(("h2", "/id/H")) == ((10L, 10L, 20L, 0)))
  }

  test("recrawlPlan: all five decision classes, ISO string comparison") {
    import graft.ingest.Frontier
    val entries = Seq(
      ("u/new", Some("2026-08-05")),       // not in log
      ("u/stale", Some("2026-08-20")),     // lastmod after crawl
      ("u/fresh", Some("2026-08-02")),     // lastmod before crawl
      ("u/aged", None),                    // no claim, old crawl
      ("u/unclaimed", None),               // no claim, recent crawl
      ("u/boundary", Some("2026-08-04")))  // lastmod == last_crawl -> fresh
      .toDF("loc", "lastmod")
    val log = Seq(
      ("u/stale", "2026-08-04"), ("u/fresh", "2026-08-04"),
      ("u/aged", "2026-08-01"), ("u/unclaimed", "2026-08-12"),
      ("u/boundary", "2026-08-04")).toDF("loc", "last_crawl")
    val out = Frontier.recrawlPlan(entries, "loc", "lastmod",
        log, "loc", "last_crawl", agedCutoff = "2026-08-10")
      .select($"loc", $"action", $"reason")
      .as[(String, String, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out("u/new") == (("fetch", "new")))
    assert(out("u/stale") == (("fetch", "stale")))
    assert(out("u/fresh") == (("skip", "fresh")))
    assert(out("u/aged") == (("fetch", "aged")))
    assert(out("u/unclaimed") == (("skip", "unclaimed")))
    assert(out("u/boundary") == (("skip", "fresh")), "equal timestamps are fresh")
  }

  test("sitemapUrls: global position, no group impact, dup collapse") {
    import graft.ingest.Sitemaps
    val txt =
      """Sitemap: https://h/pre-group.xml
        |User-agent: a
        |Sitemap: https://h/mid.xml # trailing comment
        |User-agent: b
        |Disallow: /x
        |SITEMAP: https://h/pre-group.xml
        |Sitemap:
        |""".stripMargin
    val robots = Seq(("h", txt)).toDF("host", "txt")
    val urls = Robots.sitemapUrls(robots, "host", "txt")
      .as[(String, String)].collect().toSet
    assert(urls == Set(("h", "https://h/pre-group.xml"), ("h", "https://h/mid.xml")))
    // RFC: a Sitemap line between two User-agent lines must NOT split
    // their header run — a and b share one group
    val t = Robots.ruleTable(robots, "host", "txt")
      .as[(String, Long, String, String, Int)].collect().toSet
    assert(t == Set(("h", 1L, "a", "/x", 0), ("h", 1L, "b", "/x", 0)))
    // sitemap XML subset: comment trap, padded loc, absent lastmod,
    // case-insensitive tags, loc-less entry drop
    val xml = Seq(("h",
      """<urlset><!-- <url><loc>https://h/trap</loc></url> -->
        |<url><LOC>  https://h/a  </LOC><lastmod> 2026-01-02 </lastmod></url>
        |<url><loc>https://h/b</loc></url>
        |<url><lastmod>2026-01-03</lastmod></url>
        |</urlset>""".stripMargin)).toDF("host", "xml")
    val es = Sitemaps.entries(xml, "xml")
      .as[(String, String, Option[String])].collect().toSet
    assert(es == Set(
      ("h", "https://h/a", Some("2026-01-02")),
      ("h", "https://h/b", None)))
    // sitemapindex: <sitemap> children parse with the same rules; a
    // urlset probed as an index yields zero rows and vice versa, so
    // the ingest loop (indexEntries -> fetch -> entries) probes blind
    val idx = Seq(("h",
      """<sitemapindex><!-- <sitemap><loc>https://h/trap.xml</loc></sitemap> -->
        |<sitemap><loc> https://h/s1.xml </loc><lastmod>2026-02-01</lastmod></sitemap>
        |<SITEMAP><loc>https://h/s2.xml</loc></SITEMAP>
        |<sitemap><lastmod>2026-02-02</lastmod></sitemap>
        |</sitemapindex>""".stripMargin)).toDF("host", "xml")
    val is = Sitemaps.indexEntries(idx, "xml")
      .as[(String, String, Option[String])].collect().toSet
    assert(is == Set(
      ("h", "https://h/s1.xml", Some("2026-02-01")),
      ("h", "https://h/s2.xml", None)))
    assert(Sitemaps.entries(idx, "xml").count() == 0, "index is not a urlset")
    assert(Sitemaps.indexEntries(xml, "xml").count() == 0, "urlset is not an index")
  }

  test("parser: CRLF and mixed line endings parse identically to LF") {
    val lf = "User-agent: *\nDisallow: /x\nAllow: /x/ok\nSitemap: https://h/s.xml\n"
    val crlf = lf.replace("\n", "\r\n")
    val mixed = "User-agent: *\r\nDisallow: /x\nAllow: /x/ok\r\nSitemap: https://h/s.xml\n"
    def rules(txt: String) =
      Robots.ruleTable(Seq(("h", txt)).toDF("host", "txt"), "host", "txt")
        .as[(String, Long, String, String, Int)].collect().toSet
    def maps(txt: String) =
      Robots.sitemapUrls(Seq(("h", txt)).toDF("host", "txt"), "host", "txt")
        .as[(String, String)].collect().toSet
    assert(rules(crlf) == rules(lf) && rules(mixed) == rules(lf))
    assert(rules(lf).exists(_._4 == "/x"), "no \\r inside rule paths")
    assert(maps(crlf) == maps(lf) && maps(mixed) == maps(lf))
    assert(maps(lf) == Set(("h", "https://h/s.xml")))
  }

  test("parser: garbage lines, comments, and case-insensitive keys survive") {
    val messy = Seq(("h1",
      "this is not a directive\nUSER-AGENT: *\n DISALLOW : /z # inline\nnoise\n"))
      .toDF("host", "txt")
    val t = Robots.ruleTable(messy, "host", "txt")
      .as[(String, Long, String, String, Int)].collect().toSet
    assert(t == Set(("h1", 1L, "*", "/z", 0)))
  }
}
