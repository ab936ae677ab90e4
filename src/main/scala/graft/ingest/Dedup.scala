package graft.ingest

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Dataset

/** Scraped-corpus deduplication (SURVEY.md T1/T2; reference
  * `scraper_app/src/scraper_app/utils/dedup_util.py`).
  *
  * Two passes over one company's pages:
  *
  *  - '''T1 exact-dup drop''' (`dedup_util.py:274-308`): SHA-256 over the
  *    trimmed body only (URL excluded) — first occurrence keeps its body,
  *    later occurrences become URL-only stubs.
  *  - '''T2 header/footer strip''' (`dedup_util.py:153-221`): longest
  *    common leading/trailing line runs shared by ≥95% of unique pages,
  *    min 3 lines, header preferred when they overlap; candidate lines
  *    come from the longest page so short outliers don't cap detection.
  *
  * Scale shape: the unit of work is one company (reference envelope
  * ~1 GB max, `dedup_util.py:9`), so the Spark form is
  * `groupByKey(company).flatMapGroups` — per-company work is a single
  * task with exactly the reference's sequential semantics, while millions
  * of companies spread across the cluster. That beats a
  * posexplode/window formulation here because T2's "longest consecutive
  * prefix run vs one reference page" is order-sensitive within the page,
  * and per-group state is bounded by the scrape validity cap.
  */
object Dedup {
  val MinRepeatedLines = 3
  val HeaderFooterThreshold = 0.95
  val StubText = "[duplicate — content identical to a previously scraped page]\n"

  final case class PageOut(url: String, body: String, isStub: Boolean)

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** Body-only content hash (T1 key). */
  def hashBody(body: String): String = sha256Hex(body.strip())

  /** Longest common leading/trailing line runs over unique pages'
    * keepends line lists; see class doc for the vote rules.
    */
  def detectCommonHeaderFooter(
      pages: Seq[Vector[String]],
      minLines: Int = MinRepeatedLines,
      threshold: Double = HeaderFooterThreshold)
      : (Vector[String], Vector[String]) = {
    if (pages.length < 2) return (Vector.empty, Vector.empty)
    val ref = pages.maxBy(_.length)
    if (ref.isEmpty) return (Vector.empty, Vector.empty)
    val total = pages.length
    val required = threshold * total

    var headerLen = 0
    var pos = 0
    var growing = true
    while (growing && pos < ref.length) {
      val candidate = ref(pos)
      val matches = pages.count(ls => ls.length > pos && ls(pos) == candidate)
      if (matches >= required) { headerLen += 1; pos += 1 } else growing = false
    }

    var footerLen = 0
    var back = 1
    growing = true
    while (growing && back <= ref.length) {
      val candidate = ref(ref.length - back)
      val matches = pages.count(ls => ls.length >= back && ls(ls.length - back) == candidate)
      if (matches >= required) { footerLen += 1; back += 1 } else growing = false
    }

    var header = if (headerLen >= minLines) ref.take(headerLen) else Vector.empty[String]
    var footer = if (footerLen >= minLines) ref.takeRight(footerLen) else Vector.empty[String]
    // Overlap on very short pages: header wins.
    if (header.nonEmpty && footer.nonEmpty && header.length + footer.length >= ref.length)
      footer = Vector.empty
    (header, footer)
  }

  /** Strip a detected header/footer from one body (only when the body
    * actually starts/ends with the full run).
    */
  def stripBoilerplate(
      bodyLines: Vector[String],
      header: Vector[String],
      footer: Vector[String]): Vector[String] = {
    var b = bodyLines
    if (header.nonEmpty && b.take(header.length) == header) b = b.drop(header.length)
    if (footer.nonEmpty && b.takeRight(footer.length) == footer) b = b.dropRight(footer.length)
    b
  }

  /** Both passes over one company's bodies, in page order. */
  def dedupBodies(bodies: Seq[String]): Vector[PageOut] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    val tagged = bodies.map { body =>
      val fresh = seen.add(hashBody(body))
      (body, !fresh)
    }.toVector
    val uniqueLineLists = tagged.collect { case (b, false) => Blocks.splitKeepEnds(b) }
    if (uniqueLineLists.length < 2)
      return tagged.map { case (b, isStub) =>
        PageOut("", if (isStub) StubText else b, isStub)
      }
    val (header, footer) = detectCommonHeaderFooter(uniqueLineLists)
    tagged.map { case (body, isStub) =>
      if (isStub) PageOut("", StubText, isStub = true)
      else if (header.nonEmpty || footer.nonEmpty)
        PageOut("", stripBoilerplate(Blocks.splitKeepEnds(body), header, footer).mkString, isStub = false)
      else PageOut("", body, isStub = false)
    }
  }

  /** Whole-string form — parity surface with the reference's
    * `deduplicate_scraped_content(combined) -> str`.
    */
  def dedupCombined(combined: String): String = {
    if (combined == null || combined.trim.isEmpty) return combined
    val blocks = Blocks.iterBlocks(combined)
    val results = dedupBodies(blocks.map(Blocks.bodyOf))
    blocks.zip(results).map { case (block, r) =>
      Blocks.prefixOf(block) + r.body
    }.mkString
  }

  /** Distributed form over corpus rows: group by company+version, run the
    * reference passes per group, keep page order and stub flags.
    */
  def dedupCorpus(pages: Dataset[CorpusPage]): Dataset[CorpusPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .groupByKey(p => (p.etld1, p.version_id))
      .flatMapGroups { (_: (String, String), it: Iterator[CorpusPage]) =>
        val sorted = it.toVector.sortBy(_.page_seq)
        val results = dedupBodies(sorted.map(_.body))
        sorted.zip(results).map { case (p, r) =>
          p.copy(body = r.body)
        }
      }
  }
}
