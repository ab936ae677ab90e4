package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing (the `<urlset>` protocol every crawler
  * seeds its frontier from — [[Robots.sitemapUrls]] points here): per
  * sitemap blob, one row per `<url>` entry with its required `<loc>`
  * and optional `<lastmod>` — the change signal a recrawl scheduler
  * prioritizes on.
  *
  * Supported subset, spec-pinned: `<urlset>` documents; XML comments
  * stripped FIRST (a commented-out `<url>` block is not an entry —
  * the q135 comment discipline); case-insensitive tags; whitespace
  * around values trimmed; entries without a `<loc>` drop; `<lastmod>`
  * absent → null. `<sitemapindex>` nesting stays with the caller (its
  * `<sitemap><loc>` children parse with the same extractor — fetching
  * the next level is an ingest-loop concern, not a parse concern).
  *
  * Scale shape: blobs parse independently per row — one
  * `regexp_extract_all` per blob + an entry-bounded explode + per-row
  * field regexes; no state, no shuffle (the [[Warc]] segment
  * argument). All patterns are lazy-dotall literal-class RE2-parity.
  */
object Sitemaps {

  /** `(… keys …, loc, lastmod)` — one row per entry in `xmlCol`. */
  def entries(df: DataFrame, xmlCol: String): DataFrame = {
    val clean = regexp_replace(col(xmlCol), "(?s)<!--.*?-->", "")
    val blocks = regexp_extract_all(clean, lit("(?is)<url>(.*?)</url>"), lit(1))
    val loc = regexp_extract(col("__u"), "(?is)<loc>\\s*(.*?)\\s*</loc>", 1)
    val lastmod =
      regexp_extract(col("__u"), "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
    df.withColumn("__u", explode(blocks))
      .withColumn("loc", loc)
      .withColumn("lastmod", when(length(lastmod) > 0, lastmod))
      .filter(length(col("loc")) > 0)
      .drop("__u", xmlCol)
  }
}
