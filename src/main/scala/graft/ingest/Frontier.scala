package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the step between
  * [[Robots.allowed]] admission and the fetcher fleet: per host, URLs
  * fetch one at a time spaced by the host's crawl delay, so slot k
  * fires at `k × delay_ms`. A frontier that ignores this either
  * hammers hosts or (the subtler production failure) lets one
  * million-URL host serialize a whole fetch wave.
  *
  * Scale shape: hosts schedule independently — a per-HOST window
  * (priority desc, id asc — total order, deterministic) assigns slots,
  * a size-conditional broadcast joins the per-host delay table
  * (distinct hosts ≪ URLs), and the per-host budget cap bounds any
  * single host's contribution to the wave, which is ALSO the skew
  * guard: the window's largest partition group is `maxPerHost` after
  * the filter, but the rank itself is computed pre-filter, so a giant
  * host costs one window pass over its own rows, never a global sort.
  */
object Frontier {

  /** Assign fetch slots: `(… urls …, delay_ms, slot, fetch_offset_ms)`
    * for the first `maxPerHost` URLs per host by descending priority
    * (id ascending tiebreak). `delays` is (hostCol, delay_ms) from
    * [[Robots.crawlDelays]] (or any source); hosts absent from it get
    * `defaultDelayMs`.
    */
  /** Side tables joined onto the URL relation are host-grained BY
    * CONTRACT — a duplicate host row would silently multiply every
    * URL of that host through the schedule window. Enforced IN-PLAN
    * (r12, the VERDICT-r11 probe-cost item — the r11 eager probe job
    * was q152's only >2× bench regression): the side table folds to
    * one row per host with a dup counter, and the JOIN KEY itself
    * `raise_error`s when the counter exceeds 1. Zero extra jobs — the
    * groupBy runs on the broadcast-sized side inside the query the
    * caller already pays — and the check is structurally unprunable:
    * the key expression feeds the join, so no downstream column
    * selection can optimize it away (unlike a check riding a payload
    * column). A duplicate therefore still fails loudly and
    * UNCONDITIONALLY, at first execution rather than at call time.
    * CAVEAT (the call-time → execution-time trade, documented): the
    * probe fires only if the join's build side is actually evaluated —
    * a plan that is never executed, a `limit(0)` above it, or AQE
    * empty-relation propagation (an empty `urls` side folds the join
    * away before the side table materializes) skips validation for
    * that run. Acceptable here because an unexecuted or empty-input
    * schedule emits no rows a duplicate could corrupt; a caller
    * needing call-time strictness can probe the (broadcast-small)
    * side table driver-side before calling. A single null-host row
    * passes exactly as before (null joins
    * nothing). Output is `(__key, valueCol)` with the value renamed
    * to `valueCol`'s name, extra input columns dropped (the schedule
    * contract uses exactly host + value).
    */
  private def oneRowPerHostKeyed(t: DataFrame, hostCol: String,
      valueCol: Column, valueName: String, keyName: String,
      what: String): DataFrame =
    t.groupBy(col(hostCol))
      .agg(first(valueCol).as(valueName), count(lit(1)).as("__dupc"))
      .select(
        when(col("__dupc") > 1,
          raise_error(lit(s"$what must have exactly one row per host")))
          .otherwise(col(hostCol)).as(keyName),
        col(valueName))

  def schedule(urls: DataFrame, idCol: String, hostCol: String,
      priorityCol: Column, delays: DataFrame, defaultDelayMs: Long,
      maxPerHost: Int): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be positive: $maxPerHost")
    val d = oneRowPerHostKeyed(delays, hostCol,
      col("delay_ms"), "delay_ms", "__dhost", "delays")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(priorityCol.desc, col(idCol).asc)
    urls
      .join(broadcast(d), urls(hostCol) === col("__dhost"), "left")
      .withColumn("delay_ms",
        coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .drop("__dhost")
      // the budget filter runs on the RAW row_number so Catalyst's
      // InferWindowGroupLimit rewrite fires (map tasks truncate each
      // host to maxPerHost rows BEFORE the exchange — the r10 plan
      // probe showed the previous `slot < k` form, a filter on the
      // derived column, shipped every URL of a million-URL host into
      // the window sort instead)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerHost)
      .withColumn("slot", (col("__rn") - 1).cast("long"))
      .drop("__rn")
      .withColumn("fetch_offset_ms", col("slot") * col("delay_ms"))
  }

  /** Recrawl planning — the FRESHNESS half of incremental crawling
    * ([[graft.textops.CurationOps.snapshotDiff]] is the content half
    * AFTER a fetch; this decides which fetches to spend at all, from
    * sitemap `lastmod` claims vs the crawl log):
    *
    *  - no log row → `fetch` / `new`;
    *  - `lastmod > last_crawl` (ISO-8601 strings compare
    *    lexicographically — no date parsing, no timezone ambiguity) →
    *    `fetch` / `stale`;
    *  - `lastmod ≤ last_crawl` → `skip` / `fresh`;
    *  - no `lastmod` claim → age-based refresh: `fetch` / `aged` iff
    *    `last_crawl < agedCutoff`, else `skip` / `unclaimed`.
    *
    * Scale shape: ONE equi-join on the URL (the crawl log projects to
    * `(loc, last_crawl)` — no page content crosses the shuffle) + a
    * per-row CASE; at a billion URLs this is the honest sort-merge on
    * the frontier key, or co-located under a shared bucketing.
    */
  /** Crawl-trap / URL-template explosion panel — the frontier's
    * third input besides robots admission and recrawl freshness: a
    * calendar, session-id, or faceted-search trap generates unbounded
    * DISTINCT URLs from a handful of path TEMPLATES, and a frontier
    * that can't see template mass spends its fetch budget inside one
    * generator. Each path folds to its template (long hex runs → `H`
    * first — ids/uuids/hashes — then digit runs → `N`; lowercased);
    * the panel emits per (host, template): URL mass, distinct-path
    * cardinality, the host-relative share as an INTEGER percentage
    * (`n·100 div total` — the r10 no-floats-in-gates discipline), and
    * a trap flag: share ≥ `sharePct` AND distinct paths ≥
    * `minPaths` (one popular static page is not a trap — its distinct
    * cardinality is 1; a calendar's is its URL count).
    *
    * Scale shape: one map-side-combinable groupBy on (host,
    * template); the per-host total is a window over the AGGREGATED
    * relation (rows per host = its template count, thousands at
    * worst — never its URL count), so a million-URL trap host costs
    * one combine, not a sort of its URLs.
    */
  /** The [[trapPanel]] template fold, exposed so callers can key
    * per-URL mitigation (caps, drops) on the same fold the panel
    * aggregated by.
    */
  def urlTemplate(path: Column): Column =
    regexp_replace(
      regexp_replace(lower(path), "[0-9a-f]{8,}", "H"),
      "[0-9]+", "N")

  def trapPanel(urls: DataFrame, hostCol: String, pathCol: String,
      sharePct: Int, minPaths: Int): DataFrame = {
    val agg = urls
      .select(col(hostCol), col(pathCol),
        urlTemplate(col(pathCol)).as("template"))
      .groupBy(col(hostCol), col("template"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(pathCol)).as("n_paths"))
    val w = Window.partitionBy(col(hostCol))
    agg
      .withColumn("__total", sum(col("n_urls")).over(w))
      .withColumn("share_pct",
        expr("n_urls * CAST(100 AS BIGINT) div __total"))
      .drop("__total")
      .withColumn("trap",
        (col("share_pct") >= sharePct && col("n_paths") >= minPaths)
          .cast("int"))
  }

  /** Frontier priority scoring — the fold that turns the three crawl
    * panels into ONE fetch order (what Nutch's scoring filters and
    * every production frontier do before handing URLs to
    * [[schedule]]):
    *
    *  - freshness band from [[recrawlPlan]]'s reason:
    *    `new`=3 > `stale`=2 > `aged`=1 > anything else 0;
    *  - authority from the host in-degree panel
    *    ([[graft.streaming.StreamHostGraph.hostInDegree]]): distinct
    *    linking pages, capped at 999 999 so it can never cross bands;
    *  - trap demotion from [[trapPanel]]: a URL whose
    *    [[urlTemplate]] fold is trap-flagged on its host drops to
    *    band 0 outright — a frontier spends nothing inside a URL
    *    generator until the panel clears it.
    *
    * `priority = band * 1 000 000 + authority` — all-LONG arithmetic,
    * total order with any deterministic tiebreak the caller adds
    * (the gates use the URL itself). Rows are NOT filtered: skip
    * decisions keep their row at band 0 so a budget-starved wave can
    * still audit what it passed over; callers filter on action.
    *
    * Scale shape: both side tables are host- / (host, template)-
    * grained — millions of rows against billions of URLs — so both
    * joins broadcast (size-pinned by the panels' own grain, not
    * guessed); the template fold and band math are per-row codegen.
    * Nothing here shuffles the URL relation.
    */
  def prioritize(plan: DataFrame, locCol: String, hostCol: String,
      reasonCol: String,
      indegree: DataFrame, indegHostCol: String, authCol: String,
      traps: DataFrame, trapHostCol: String, trapTemplateCol: String,
      trapFlagCol: String): DataFrame = {
    // case-insensitive scheme: an uncanonicalized 'HTTP://…' loc must
    // still yield its path, or its template silently escapes trap
    // demotion (nothing here requires canonicalUrl ran upstream)
    val path = regexp_extract(col(locCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$", 1)
    val ind = indegree.select(col(indegHostCol).as("__ihost"),
      col(authCol).cast("long").as("__auth"))
    val tr = traps.filter(col(trapFlagCol) === 1)
      .select(col(trapHostCol).as("__thost"),
        col(trapTemplateCol).as("__ttpl"))
    plan
      .withColumn("__tpl", urlTemplate(path))
      .join(broadcast(ind), col(hostCol) === col("__ihost"), "left")
      .join(broadcast(tr),
        col(hostCol) === col("__thost") && col("__tpl") === col("__ttpl"),
        "left")
      .withColumn("authority",
        least(coalesce(col("__auth"), lit(0L)), lit(999999L)))
      .withColumn("trapped", col("__thost").isNotNull.cast("int"))
      .withColumn("band",
        when(col("trapped") === 1, lit(0L))
          .when(col(reasonCol) === "new", lit(3L))
          .when(col(reasonCol) === "stale", lit(2L))
          .when(col(reasonCol) === "aged", lit(1L))
          .otherwise(lit(0L)))
      .withColumn("priority", col("band") * lit(1000000L) + col("authority"))
      .drop("__ihost", "__auth", "__thost", "__ttpl", "__tpl")
  }

  /** [[schedule]] with PER-HOST budgets — the consumer that makes
    * [[apportion]]'s quotas real: each host fetches its first
    * `quota_h` URLs by descending priority (id-asc tiebreak) at its
    * politeness spacing, instead of one global `maxPerHost`. Hosts
    * absent from `budgets` (or with quota 0) contribute NOTHING to
    * the wave — an unbudgeted host must not fetch.
    *
    * `hardCap` is the map-side truncation bound: the per-host window
    * filter carries BOTH `rn ≤ hardCap` (a literal —
    * InferWindowGroupLimit fires on it, so map tasks truncate every
    * host to hardCap rows before the exchange) and `rn ≤ quota_h`
    * (the dynamic refinement Catalyst cannot pre-push). Pass the
    * wave's total budget: no host's quota can exceed it, so the
    * literal bound never clips a legitimate slot.
    *
    * Scale shape: [[schedule]]'s — per-host window, broadcast delay
    * and budget tables (both host-grained), WindowGroupLimit at
    * hardCap; the quota filter then drops rank rows beyond each
    * host's allocation.
    */
  def scheduleBudgeted(urls: DataFrame, idCol: String, hostCol: String,
      priorityCol: Column, delays: DataFrame, defaultDelayMs: Long,
      budgets: DataFrame, bHostCol: String, quotaCol: String,
      hardCap: Int): DataFrame = {
    require(hardCap > 0, s"hardCap must be positive: $hardCap")
    val d = oneRowPerHostKeyed(delays, hostCol,
      col("delay_ms"), "delay_ms", "__dhost", "delays")
    val b = oneRowPerHostKeyed(budgets, bHostCol,
      col(quotaCol).cast("long"), "__quota", "__bhost", "budgets")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(priorityCol.desc, col(idCol).asc)
    urls
      .join(broadcast(d), urls(hostCol) === col("__dhost"), "left")
      .withColumn("delay_ms",
        coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .drop("__dhost")
      .join(broadcast(b), col(hostCol) === col("__bhost"), "left")
      .withColumn("__quota", coalesce(col("__quota"), lit(0L)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= hardCap && col("__rn") <= col("__quota"))
      .withColumn("slot", (col("__rn") - 1).cast("long"))
      .drop("__rn", "__bhost", "__quota")
      .withColumn("fetch_offset_ms", col("slot") * col("delay_ms"))
  }

  /** Fetch-budget apportionment — largest-remainder (Hamilton) method
    * over host mass: a wave has `budget` fetches to spend and each
    * host a nonnegative integer `mass` (priority sum, backlog, page
    * count); each host gets `⌊budget·mass/total⌋` plus one top-up for
    * the `budget − Σ⌊·⌋` largest remainders (ties broken by host asc —
    * total order, deterministic). Quotas sum to EXACTLY `budget` (the
    * fractional parts sum to the leftover count), every step is 64-bit
    * integer arithmetic — bit-identical on any engine. Requires
    * `budget · max(mass) < 2^63` (normalize mass first at extreme
    * scales) and at least one positive mass.
    *
    * Scale shape: two 1-row aggregates (total, leftover) broadcast
    * back — never collected; the remainder rank is the TWO-PHASE
    * global rank ([[graft.textops.CurationOps.trainOrder]]'s pattern):
    * range-partition on (−remainder, host), rank within partitions (a
    * PARTITIONED window — parallel), add per-partition offsets (one
    * control-plane row per shuffle partition). No single-task window
    * ever sees the host relation.
    */
  def apportion(mass: DataFrame, hostCol: String, massCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val spark = mass.sparkSession
    import spark.implicits._
    // materialized once: four consumers (two precondition probes, the
    // total aggregate, the base/remainder pass) would otherwise each
    // re-derive the host-mass frame from its source (q177: the per-host
    // mass aggregation over the corpus, re-run per consumer)
    val m = mass.select(col(hostCol).as("host"),
      col(massCol).cast("long").as("mass"))
      .localCheckpoint()
    // enforce the documented precondition up front (the PageRank/Hits
    // convention): a negative mass corrupts the div/% pair silently,
    // and an all-zero table would emit all-NULL quotas instead of the
    // exact-sum guarantee. Bounded jobs: limit-1 scan + one aggregate.
    require(m.filter(col("mass") < 0 || col("mass").isNull).limit(1).count() == 0L,
      "host mass must be non-negative")
    require(m.agg(coalesce(sum(col("mass")), lit(0L))).as[Long].head() > 0L,
      "at least one host must carry positive mass")
    val tot = m.agg(sum(col("mass")).as("__tot"))
    val based = m.join(broadcast(tot))
      .withColumn("__base", expr(s"($budget * mass) div __tot"))
      .withColumn("__nr", -expr(s"($budget * mass) % __tot"))
      // two consumers (the leftover aggregate and the rank pass)
      .localCheckpoint(eager = false)
    val leftover = based.agg((lit(budget) - sum(col("__base"))).as("__left"))
    val parted = based
      .repartitionByRange(col("__nr"), col("host"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false) // size agg + rank must see same pids
    val sizes = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, n) => val off = acc; acc += n; (pid, off) }
    val offs = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__nr"), col("host"))
    parted
      .withColumn("__lr", row_number().over(w))
      .join(offs, "__pid")
      .join(broadcast(leftover))
      .withColumn("quota",
        col("__base") + when(col("__lr") + col("__off") <= col("__left"), 1L)
          .otherwise(0L))
      .select(col("host"), col("mass"), col("quota"))
  }

  /** Fetch-status triage — the health panel the scheduler reads
    * before spending budget on a host: per host, fetch counts by
    * status class (2xx/3xx/4xx/5xx), the error rate as integer ppm
    * (`(n_4xx + n_5xx)·10⁶ div n` — the no-floats-in-gates
    * discipline), and a backoff flag at the given ppm threshold — a
    * host past it gets its politeness delay raised or its wave quota
    * zeroed rather than hammered while it is failing. Statuses
    * outside 200-599 count toward `n_fetches` only (connection-level
    * failures logged as 0/−1 are neither success nor an HTTP error
    * class; track them upstream).
    *
    * Scale shape: per-row CASE math + ONE map-side-combinable groupBy
    * on the host — the fetch log shuffles once, host-keyed, and the
    * panel is host-grained state a streaming session could sum-merge
    * (the StreamHostGraph law — every column is an additive count or
    * derived from one).
    */
  def statusTriage(log: DataFrame, hostCol: String, statusCol: String,
      backoffPpm: Long): DataFrame = {
    require(backoffPpm >= 0, s"backoffPpm must be non-negative: $backoffPpm")
    val s = col(statusCol)
    def cls(lo: Int, hi: Int) =
      sum(when(s >= lo && s <= hi, 1L).otherwise(0L))
    log.groupBy(col(hostCol))
      .agg(count(lit(1)).as("n_fetches"),
        cls(200, 299).as("n_2xx"), cls(300, 399).as("n_3xx"),
        cls(400, 499).as("n_4xx"), cls(500, 599).as("n_5xx"))
      .withColumn("error_ppm",
        expr("(n_4xx + n_5xx) * CAST(1000000 AS BIGINT) div n_fetches"))
      .withColumn("backoff", (col("error_ppm") >= backoffPpm).cast("int"))
  }

  def recrawlPlan(entries: DataFrame, locCol: String, lastmodCol: String,
      crawlLog: DataFrame, logLocCol: String, lastCrawlCol: String,
      agedCutoff: String): DataFrame = {
    val log = crawlLog.select(col(logLocCol).as("__loc"),
      col(lastCrawlCol).as("last_crawl"))
    entries
      .join(log, entries(locCol) === col("__loc"), "left")
      .drop("__loc")
      .withColumn("action",
        when(col("last_crawl").isNull, "fetch")
          .when(col(lastmodCol).isNotNull,
            when(col(lastmodCol) > col("last_crawl"), "fetch")
              .otherwise("skip"))
          .otherwise(
            when(col("last_crawl") < lit(agedCutoff), "fetch")
              .otherwise("skip")))
      .withColumn("reason",
        when(col("last_crawl").isNull, "new")
          .when(col(lastmodCol).isNotNull,
            when(col(lastmodCol) > col("last_crawl"), "stale")
              .otherwise("fresh"))
          .otherwise(
            when(col("last_crawl") < lit(agedCutoff), "aged")
              .otherwise("unclaimed")))
  }
}
