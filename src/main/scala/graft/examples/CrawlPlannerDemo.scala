package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{Frontier, Robots, Sitemaps}
import graft.streaming.StreamHostGraph
import graft.textops.TextAnalysis

/** The crawl-side loop composed end to end — the half of the web
  * pipeline [[WebIngestDemo]] doesn't show, at demo scale. Run:
  * `sbt "runMain graft.examples.CrawlPlannerDemo"`.
  *
  * Sitemap seeding (q157: robots `Sitemap:` directives → urlset
  * parse) → recrawl plan (q158: lastmod vs the crawl log) → robots
  * admission (q150: precedence, longest-prefix, Allow ties) →
  * politeness schedule (q152: Crawl-delay parse, per-host slots under
  * a budget) → [fetch] → outlink extraction from the fetched pages
  * (q148) → host in-degree panel (q153, the [[StreamHostGraph]] batch
  * twin) + anchor-text panel (q164 live) → the priority fold (q166:
  * freshness × authority × trap demotion) → redirect resolution
  * (q167) → the NEXT frontier wave. Every stage is per-row math, a
  * per-HOST window, or one rollup — at a billion URLs the only
  * shuffles are host- and id-keyed.
  */
object CrawlPlannerDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-crawl-planner")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")

    // per-host crawl policy (a * group; even-length hosts add a
    // stricter bot-specific group — the precedence case; every host
    // advertises its sitemap)
    val robots = docs.select($"source").distinct()
      .select($"source".as("host"), concat(
        // the * group carries an RFC 9309 wildcard rule: block every
        // /page/ URL ending in 7 (the `*`/`$` pattern path)
        lit("User-agent: *\nDisallow: /private\nDisallow: /page/*7$\nCrawl-delay: 2\n"),
        lit("Sitemap: https://"), $"source", lit("/sitemap.xml\n"),
        // even hosts add a GraftBot group that SHADOWS `*` (so it
        // needs its own wildcard Disallow) and carves an Allow
        // exception back out — longest-match wins the `*7$` vs `*47$`
        // overlap, so /page/147 fetches while /page/137 blocks
        when(length($"source") % 2 === 0,
          lit("\nUser-agent: GraftBot\nAllow: /private/ok\n" +
            "Disallow: /page/*7$\nAllow: /page/*47$\nCrawl-delay: 0.5\n"))
          .otherwise(lit("")))
        .as("txt"))
    println(s"[demo] sitemap directives: ${
      Robots.sitemapUrls(robots, "host", "txt").count()} hosts advertise one")

    // sitemapindex level (q162): big sites advertise an INDEX whose
    // children are the real urlsets — the loop probes blind
    // (indexEntries on a urlset yields zero rows) and fetches one
    // level deeper
    val index = docs.select($"source").distinct().select($"source",
      concat(lit("<sitemapindex><sitemap><loc>https://"), $"source",
        lit("/sitemap.xml</loc><lastmod>2026-08-01</lastmod></sitemap>"),
        lit("</sitemapindex>")).as("xml"))
    println(s"[demo] sitemapindex: ${
      Sitemaps.indexEntries(index, "xml").count()} child sitemaps discovered")

    // sitemap seeding + recrawl plan: each host's urlset claims
    // lastmods; a synthetic crawl log makes some entries fresh
    val xml = docs.groupBy($"source").agg(concat(lit("<urlset>"),
      array_join(collect_list(concat(
        lit("<url><loc>https://"), $"source", lit("/p/"), $"doc_id",
        lit("</loc><lastmod>2026-08-"),
        lpad((($"doc_id" % 28) + 1).cast("string"), 2, "0"),
        lit("</lastmod></url>"))), ""),
      lit("</urlset>")).as("xml"))
    val entries = Sitemaps.entries(xml, "xml")
    val crawlLog = docs.filter($"doc_id" % 2 === 0).select(
      concat(lit("https://"), $"source", lit("/p/"), $"doc_id").as("loc"),
      lit("2026-08-14").as("last_crawl"))
    val plan = Frontier.recrawlPlan(entries, "loc", "lastmod",
      crawlLog, "loc", "last_crawl", agedCutoff = "2026-08-01")
    println(s"[demo] recrawl plan: ${
      plan.filter($"action" === "fetch").count()} fetches of ${plan.count()} entries")

    // frontier wave 1: candidate URLs
    val frontier = docs.select($"doc_id", $"source".as("host"),
      // mod-7 splitter: coprime with the demo corpus's source =
      // src(doc_id % 20), so both path classes occur on EVERY host
      // (a mod-5 split would give each host exactly one class)
      when($"doc_id" % 7 === 0,
        concat(lit("/private/ok/"), $"doc_id"))
        .when($"doc_id" % 7 === 1, concat(lit("/docs/v"), $"doc_id"))
        .otherwise(concat(lit("/page/"), $"doc_id")).as("path"),
      ($"doc_id" % 97).as("priority"))

    val admitted = Robots.allowed(frontier, "doc_id", "host", "path",
        robots, "host", "txt", "GraftBot")
      .filter($"allowed" === 1)
    println(s"[demo] admitted ${admitted.count()} of ${frontier.count()} candidates")

    // crawl-trap mitigation (q161): one host grew a calendar
    // generator; the panel flags its template (high share AND high
    // distinct-path cardinality) and the wave caps flagged templates
    // at 15 URLs instead of letting the generator flood the budget
    val trapGen = docs.limit(250).select(($"doc_id" + 100000L).as("doc_id"),
      lit("src0").as("host"),
      concat(lit("/cal/"), (($"doc_id" % 28) + 1).cast("string"), lit("/"),
        (($"doc_id" % 12) + 1).cast("string")).as("path"),
      lit(1L).as("priority"), lit(1).as("allowed"),
      lit(null).cast("string").as("rule"))
    val aug = admitted.unionByName(trapGen)
    val tpanel = Frontier.trapPanel(aug, "host", "path",
      sharePct = 90, minPaths = 20)
    val flagged = tpanel.filter($"trap" === 1)
      .select($"host".as("__fhost"), $"template".as("__ftpl"))
    println(s"[demo] trap templates flagged: ${flagged.count()}")
    val wTpl = org.apache.spark.sql.expressions.Window
      .partitionBy($"host", $"__tpl").orderBy($"priority".desc, $"doc_id".asc)
    val mitigated = aug
      .withColumn("__tpl", Frontier.urlTemplate($"path"))
      .join(flagged, $"host" === $"__fhost" && $"__tpl" === $"__ftpl", "left")
      .withColumn("__rk", row_number().over(wTpl))
      .filter($"__fhost".isNull || $"__rk" <= 15)
      .drop("__fhost", "__ftpl", "__tpl", "__rk")
    println(s"[demo] trap cap: ${aug.count()} -> ${mitigated.count()} URLs in the wave")

    val delays = Robots.crawlDelays(robots, "host", "txt", "GraftBot")
    val wave = Frontier.schedule(mitigated, "doc_id", "host", $"priority",
      delays, defaultDelayMs = 1000L, maxPerHost = 10)
    val makespan = wave.groupBy($"host")
      .agg(max($"fetch_offset_ms").as("makespan_ms"))
      .agg(max($"makespan_ms")).as[Long].head()
    println(s"[demo] wave of ${wave.count()} fetches, politeness makespan ${makespan} ms")

    // the same wave as a LIVE frontier (StreamFrontier): URLs arrive
    // in two discovery batches, slots continue per host across them
    // (FIFO-by-arrival — a slot handed out is a fetch in flight)
    val live = new graft.streaming.StreamFrontier.FrontierSession(
      spark, "doc_id", "host", $"priority", delays,
      defaultDelayMs = 1000L, maxPerHost = 10)
    live.ingest(mitigated.filter($"doc_id" % 2 === 0))
    live.ingest(mitigated.filter($"doc_id" % 2 === 1))
    println(s"[demo] live frontier: ${live.currentSchedule.count()} slots " +
      s"handed out across two arrival batches")

    // "fetched" pages: synthesize outlinks from the docs themselves —
    // hub/long-tail targets plus a link back into the corpus's own
    // hosts (so the in-degree panel covers the hosts the recrawl plan
    // schedules, and the priority fold below has authority to read)
    val pages = docs.select($"doc_id", concat(
      lit("<html><body><a href=\"https://hub"), ($"doc_id" % 3).cast("string"),
      lit(".test/x\">h</a>"),
      when($"doc_id" % 2 === 0,
        concat(lit("<a href=\"https://long"), ($"doc_id" % 7).cast("string"),
          lit(".tail/y\">t</a>"))).otherwise(lit("")),
      lit("<a href=\"https://src"), (($"doc_id" * 3 + 7) % 20).cast("string"),
      lit("/seen\"> See ALSO </a>"),
      lit("</body></html>")).as("page"))

    val panel = new StreamHostGraph.HostGraphSession(spark, "doc_id", "page")
    panel.ingest(pages.filter($"doc_id" % 2 === 0)) // first crawl batch
    panel.ingest(pages.filter($"doc_id" % 2 === 1)) // second crawl batch
    val indeg = panel.currentInDegree.orderBy(desc("n_links"))
    println("[demo] live in-degree panel (top 5):")
    indeg.limit(5).collect().foreach(r => println(s"[demo]   $r"))

    // anchor-text panel (q164 live): what the crawled web SAYS about
    // each target — the retrieval-training signal, maintained
    // incrementally beside the in-degree panel
    val anchors = new graft.streaming.StreamAnchorText.AnchorTextSession(
      spark, "doc_id", "page")
    anchors.ingest(pages.filter($"doc_id" % 2 === 0))
    anchors.ingest(pages.filter($"doc_id" % 2 === 1))
    println("[demo] anchor-text panel (top 3):")
    anchors.currentPanel.orderBy(desc("n_links")).limit(3).collect()
      .foreach(r => println(s"[demo]   $r"))

    // priority fold (q166): freshness band × in-degree authority ×
    // trap demotion — the recrawl plan becomes ONE fetch order
    val planH = plan.withColumn("host",
      regexp_extract($"loc", "^https://([^/]+)", 1))
    val prio = Frontier.prioritize(planH, "loc", "host", "reason",
      panel.currentInDegree.select($"host", $"n_pages"), "host", "n_pages",
      tpanel, "host", "template", "trap")
    println("[demo] prioritized fetch order (top 3):")
    prio.filter($"action" === "fetch")
      .orderBy(desc("priority"), $"loc")
      .select($"loc", $"reason", $"authority", $"priority")
      .limit(3).collect().foreach(r => println(s"[demo]   $r"))

    // redirect resolution (q167): the fetch log's 301 chains collapse
    // to endpoints in log₂(hops) keyed self-joins before any frontier
    // key is compared
    val redirects = docs.filter($"doc_id" % 16 =!= 0).select(
      concat(lit("https://moved.test/p/"), $"doc_id").as("src"),
      concat(lit("https://moved.test/p/"),
        ($"doc_id" - 1).cast("string")).as("dst"))
    val resolved = graft.graph.Redirects.resolve(redirects, "src", "dst", 4)
    println(s"[demo] redirects: ${resolved.count()} sources resolved, " +
      s"${resolved.filter($"terminal" === 1).count()} terminal, max chain " +
      s"${resolved.agg(max($"hops")).head().getLong(0)} hops")

    // next wave: discovered hosts prioritized by in-degree; discovered
    // URLs collapse through the RFC 3986 canonicalizer FIRST (q163 —
    // two spellings of one resource must be one frontier entry)
    val next = TextAnalysis.outlinkEdges(pages, "doc_id", "page")
      .filter($"external" === 1)
      .withColumn("canon",
        graft.functions.UrlUtil.canonicalUrlCol($"href"))
      .join(indeg, Seq("host"))
      .select($"doc_id", $"host", $"canon".as("path"), $"n_links".as("priority"))
      .distinct()
    println(s"[demo] next frontier: ${next.count()} discovered edges, " +
      s"${next.select($"host").distinct().count()} hosts")

    // the CONTROL LOOP closed (StreamCrawlControl): fetch results
    // stream into the per-host status panel; each wave is
    // triage → apportion → scheduleBudgeted over the panel's state,
    // so error-heavy hosts drop out of the budget until they recover
    val ctl = new graft.streaming.StreamCrawlControl.ControlSession(
      "host", "status")
    // wave-1 results: doc_id-derived statuses, one error-prone host
    ctl.ingest(docs.select($"source".as("host"),
      when($"source" === "src3", when($"doc_id" % 3 < 2, 503).otherwise(200))
        .when($"doc_id" % 11 === 0, 404).otherwise(200).as("status")))
    val ctlDelays = docs.select($"source").distinct()
      .select($"source".as("host"), lit(250L).as("delay_ms"))
    val ctlUrls = docs.select($"doc_id".as("id"), $"source".as("host"),
      ($"doc_id" % 97).as("priority"))
    val wave2 = ctl.nextWave(backoffPpm = 400000L, ctlUrls, "id", "host",
      $"priority", ctlDelays, 1000L, budget = 64L, hardCap = 64)
    val backoffHosts = graft.streaming.StreamCrawlControl
      .triageOf(ctl.currentPanel, 400000L)
      .filter($"backoff" === 1).select($"host").as[String].collect().toSeq
    println(s"[demo] control loop: wave-2 spends ${wave2.count()}/64 fetches " +
      s"across ${wave2.select($"host").distinct().count()} hosts; " +
      s"backoff: ${backoffHosts.mkString(",")}")
    spark.stop()
  }
}
