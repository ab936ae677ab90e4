package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing (the `<urlset>` protocol every crawler
  * seeds its frontier from — [[Robots.sitemapUrls]] points here): per
  * sitemap blob, one row per `<url>` entry with its required `<loc>`
  * and optional `<lastmod>` — the change signal a recrawl scheduler
  * prioritizes on.
  *
  * Supported subset, spec-pinned: `<urlset>` documents via
  * [[entries]] and `<sitemapindex>` documents via [[indexEntries]]
  * (fetching the next level is an ingest-loop concern, not a parse
  * concern — the loop alternates indexEntries → fetch → entries
  * until only urlsets remain); XML comments stripped FIRST (a
  * commented-out block is not an entry — the q135 comment
  * discipline); case-insensitive tags; whitespace around values
  * trimmed; entries without a `<loc>` drop; `<lastmod>` absent →
  * null.
  *
  * Scale shape: blobs parse independently per row — one
  * `regexp_extract_all` per blob + an entry-bounded explode + per-row
  * field regexes; no state, no shuffle (the [[Warc]] segment
  * argument). All patterns are lazy-dotall literal-class RE2-parity.
  */
object Sitemaps {

  /** `(… keys …, loc, lastmod)` — one row per entry in `xmlCol`. */
  def entries(df: DataFrame, xmlCol: String): DataFrame =
    blockEntries(df, xmlCol, "url")

  /** `<sitemapindex>` documents: one row per `<sitemap>` child with
    * its `<loc>` (the NEXT sitemap to fetch) and optional `<lastmod>`
    * (skip unchanged children — the index-level recrawl signal). Same
    * comment/case/trim/drop rules as [[entries]]; a urlset blob run
    * through this yields zero rows and vice versa, so the ingest loop
    * can probe blindly.
    */
  def indexEntries(df: DataFrame, xmlCol: String): DataFrame =
    blockEntries(df, xmlCol, "sitemap")

  private def blockEntries(df: DataFrame, xmlCol: String,
      tag: String): DataFrame = {
    val clean = regexp_replace(col(xmlCol), "(?s)<!--.*?-->", "")
    val blocks =
      regexp_extract_all(clean, lit(s"(?is)<$tag>(.*?)</$tag>"), lit(1))
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
