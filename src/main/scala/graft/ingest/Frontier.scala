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
  def schedule(urls: DataFrame, idCol: String, hostCol: String,
      priorityCol: Column, delays: DataFrame, defaultDelayMs: Long,
      maxPerHost: Int): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be positive: $maxPerHost")
    val d = delays.withColumnRenamed(hostCol, "__dhost")
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
