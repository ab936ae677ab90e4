package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

/** A parsed page of a company's scraped corpus.
  *
  * Engine `corpus` row (SURVEY.md §1.1 / FIXTURES.md §1): the reference
  * stores one combined text blob per company with `"#"*50`-separated
  * per-URL blocks (`scraper_app/src/scraper_app/services/url_scraper_service.py:389-393`);
  * the engine shreds blocks into rows so the 100 TB layout is columnar
  * and per-page operators parallelize.
  */
final case class CorpusPage(
    etld1: String,
    version_id: String,
    page_seq: Int,
    url: String,
    body: String)

/** One company's combined scrape output, pre-shredding. */
final case class CorpusDoc(etld1: String, version_id: String, combined: String)

/** Block-format codec (reference writer `url_scraper_service.py:389-393,548-551`;
  * block walking `scraper_app/src/scraper_app/utils/dedup_util.py:67-146`).
  *
  * Block shape:
  * {{{
  * ##################################################
  * <url>
  * <blank line>
  * <body lines, endings verbatim>
  * }}}
  */
object Blocks {
  val Separator: String = "#" * 50

  /** (url, body) with body's line endings kept verbatim. */
  final case class RawBlock(url: String, body: String)

  /** Split a combined scrape into blocks. Content before the first
    * separator is dropped and whitespace-only blocks are skipped, matching
    * the reference's `_iter_blocks`.
    */
  def iterBlocks(combined: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = combined.indexOf(Separator)
    if (start < 0) return Vector.empty
    var done = false
    while (!done) {
      val next = combined.indexOf(Separator, start + Separator.length)
      val block = if (next < 0) combined.substring(start)
                  else combined.substring(start, next)
      if (block.trim.nonEmpty) out += block
      if (next < 0) done = true else start = next
    }
    out.result()
  }

  /** The separator + URL + blank-line prefix of a block (verbatim). */
  def prefixOf(block: String): String = {
    val sepIdx = block.indexOf(Separator)
    val sepEnd = if (sepIdx < 0) -1 else block.indexOf('\n', sepIdx)
    if (sepEnd < 0) return block
    val urlEnd = block.indexOf('\n', sepEnd + 1)
    if (urlEnd < 0) return block
    val blankEnd = block.indexOf('\n', urlEnd + 1)
    if (blankEnd < 0) block.substring(0, urlEnd + 1)
    else block.substring(0, blankEnd + 1)
  }

  /** URL line of a block ("" when malformed). */
  def urlOf(block: String): String = {
    val sepIdx = block.indexOf(Separator)
    val sepEnd = if (sepIdx < 0) -1 else block.indexOf('\n', sepIdx)
    if (sepEnd < 0) return ""
    val urlEnd = block.indexOf('\n', sepEnd + 1)
    if (urlEnd < 0) block.substring(sepEnd + 1).trim
    else block.substring(sepEnd + 1, urlEnd).trim
  }

  /** The region the reference's `_hash_block` hashes: everything after
    * the URL line (INCLUDING the structural blank line — stripped before
    * hashing anyway). Malformed blocks (no URL line) hash their full
    * text. Distinct from [[bodyOf]]: a block missing the blank line
    * still has a nonempty hash region here, so malformed blocks with
    * different content never collide into false duplicates.
    */
  def hashRegionOf(block: String): String = {
    val sepIdx = block.indexOf(Separator)
    val sepEnd = if (sepIdx < 0) -1 else block.indexOf('\n', sepIdx)
    if (sepEnd < 0) return block
    val urlEnd = block.indexOf('\n', sepEnd + 1)
    if (urlEnd < 0) block.substring(sepEnd + 1) else block.substring(urlEnd + 1)
  }

  /** Body of a block: everything after the blank line following the URL,
    * endings verbatim ("" when the block has no body section).
    */
  def bodyOf(block: String): String = {
    val sepIdx = block.indexOf(Separator)
    val sepEnd = if (sepIdx < 0) -1 else block.indexOf('\n', sepIdx)
    if (sepEnd < 0) return ""
    val urlEnd = block.indexOf('\n', sepEnd + 1)
    if (urlEnd < 0) return ""
    val bodyStart = block.indexOf('\n', urlEnd + 1)
    if (bodyStart < 0) "" else block.substring(bodyStart + 1)
  }

  def parse(combined: String): Vector[RawBlock] =
    iterBlocks(combined).map(b => RawBlock(urlOf(b), bodyOf(b)))

  /** Inverse writer — one block per page in the reference's format. */
  def format(url: String, body: String): String =
    s"$Separator\n$url\n\n$body\n"

  /** Shred combined scrapes into corpus rows. A flatMap, not a Generator:
    * one company's text fits a task (125k-token validity cap,
    * BASELINE.md), while companies parallelize across the cluster.
    */
  def shred(docs: Dataset[CorpusDoc]): Dataset[CorpusPage] = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    docs.flatMap { d =>
      parse(d.combined).zipWithIndex.map { case (b, i) =>
        CorpusPage(d.etld1, d.version_id, i, b.url, b.body)
      }
    }
  }

  /** Split a string into lines, keeping each line's terminator —
    * Python's `splitlines(keepends=True)`, which the dedup/chunk
    * algorithms are built on. Python's terminator set is wider than
    * `\n`: `\r\n` (one terminator), `\r`, `\v`, `\f`, `\x1c`-`\x1e`,
    * `\x85`, U+2028, U+2029 — scraped text contains lone `\r` and
    * unicode separators, and a narrower split would shift chunk
    * offsets (identity!) off the reference's.
    */
  def splitKeepEnds(s: String): Vector[String] = {
    if (s.isEmpty) return Vector.empty
    def isTerm(c: Char): Boolean = c match {
      case '\n' | '\r' | '\u000B' | '\u000C' |
           '\u001C' | '\u001D' | '\u001E' | '\u0085' |
           '\u2028' | '\u2029' => true
      case _ => false
    }
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isTerm(c)) {
        val end =
          if (c == '\r' && i + 1 < s.length && s.charAt(i + 1) == '\n') i + 2
          else i + 1
        out += s.substring(start, end)
        start = end
        i = end
      } else {
        i += 1
      }
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }
}
