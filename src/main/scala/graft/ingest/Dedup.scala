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
    *
    * The T1 hash covers the reference's `_hash_block` region
    * (everything after the URL line), NOT [[Blocks.bodyOf]]: a
    * malformed block missing its blank line has an empty `bodyOf` but a
    * distinct hash region, and must not collapse into a false
    * duplicate. Boilerplate detection and rebuild still use the
    * body-lines view, which is empty for such blocks — they pass
    * through verbatim, as in the reference.
    */
  def dedupCombined(combined: String): String = {
    if (combined == null || combined.trim.isEmpty) return combined
    val blocks = Blocks.iterBlocks(combined)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val isStub = blocks.map(b => !seen.add(hashBody(Blocks.hashRegionOf(b))))
    val uniqueLineLists = blocks.zip(isStub).collect {
      case (b, false) => Blocks.splitKeepEnds(Blocks.bodyOf(b))
    }
    val (header, footer) =
      if (uniqueLineLists.length < 2) (Vector.empty[String], Vector.empty[String])
      else detectCommonHeaderFooter(uniqueLineLists)
    blocks.zip(isStub).map {
      case (block, true) => Blocks.prefixOf(block) + StubText
      case (block, false) =>
        if (header.nonEmpty || footer.nonEmpty)
          Blocks.prefixOf(block) +
            stripBoilerplate(Blocks.splitKeepEnds(Blocks.bodyOf(block)), header, footer).mkString
        else block
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

  /** Window/posexplode formulation of the same passes — the shape for a
    * pathological company whose pages exceed one task's memory (the
    * `flatMapGroups` form holds a company's pages in one group; this one
    * never materializes per-company state, only per-LINE rows):
    *
    *  1. T1: first occurrence per (company, body hash) by `page_seq`
    *     window → later occurrences become stubs;
    *  2. T2: explode unique pages into (pos, line) rows; the longest
    *     page (ties: lowest page_seq, like Python's `max`) is the
    *     reference; per-position match counts against the reference
    *     line give the ≥95% prefix/suffix runs; each page drops its
    *     header/footer only when its own prefix/suffix equals the run
    *     exactly.
    *
    * Equivalent to [[dedupCorpus]] (spec'd on seeded random corpora).
    */
  def dedupCorpusWindowed(pages: Dataset[CorpusPage]): Dataset[CorpusPage] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = pages.sparkSession
    import spark.implicits._

    val hashUdf = udf((b: String) => hashBody(b))
    val linesUdf = udf((b: String) => Blocks.splitKeepEnds(b))

    val base = pages.toDF()
      .withColumn("h", hashUdf($"body"))
    val dupW = Window.partitionBy($"etld1", $"version_id", $"h").orderBy($"page_seq")
    val tagged = base.withColumn("is_stub", row_number().over(dupW) > 1)

    val uniq = tagged.filter(!$"is_stub")
      .withColumn("lines", linesUdf($"body"))
      .withColumn("n_lines", size($"lines"))
    val keyW = Window.partitionBy($"etld1", $"version_id")
    val withTotal = uniq.withColumn("total", count(lit(1)).over(keyW))

    // reference page: longest, ties to lowest page_seq
    val refW = Window.partitionBy($"etld1", $"version_id")
      .orderBy($"n_lines".desc, $"page_seq".asc)
    val refPages = withTotal.withColumn("is_ref", row_number().over(refW) === 1)
    val refLines = refPages.filter($"is_ref")
      .select($"etld1", $"version_id", $"n_lines".as("ref_len"),
        posexplode($"lines").as(Seq("pos", "ref_line")))

    // per-line rows of every unique page, with end-relative index i (1-based)
    val lineRows = refPages
      .select($"etld1", $"version_id", $"page_seq", $"total", $"n_lines",
        posexplode($"lines").as(Seq("pos", "line")))
      .withColumn("i", $"n_lines" - $"pos")

    // header: per-pos match rate vs the reference line
    val posMatch = lineRows.join(refLines.drop("ref_len"), Seq("etld1", "version_id", "pos"))
      .groupBy($"etld1", $"version_id", $"pos")
      .agg(sum(when($"line" === $"ref_line", 1).otherwise(0)).as("matches"),
        first($"total").as("total"))
      .withColumn("ok", $"matches" >= lit(HeaderFooterThreshold) * $"total")
    val headerLen = posMatch.groupBy($"etld1", $"version_id")
      .agg(coalesce(min(when(!$"ok", $"pos")), max($"pos") + 1).as("header_len_raw"))

    // footer: same from the end; reference line at i-from-end
    val refLinesEnd = refLines.withColumn("i", $"ref_len" - $"pos")
      .select($"etld1", $"version_id", $"i", $"ref_line".as("ref_line_end"))
    val iMatch = lineRows.join(refLinesEnd, Seq("etld1", "version_id", "i"))
      .groupBy($"etld1", $"version_id", $"i")
      .agg(sum(when($"line" === $"ref_line_end", 1).otherwise(0)).as("matches"),
        first($"total").as("total"))
      .withColumn("ok", $"matches" >= lit(HeaderFooterThreshold) * $"total")
    val footerLen = iMatch.groupBy($"etld1", $"version_id")
      .agg((coalesce(min(when(!$"ok", $"i")), max($"i") + 1) - 1).as("footer_len_raw"))

    val refLen = refPages.filter($"is_ref")
      .select($"etld1", $"version_id", $"n_lines".as("ref_len"), $"total")
    val runs = refLen
      .join(headerLen, Seq("etld1", "version_id"), "left")
      .join(footerLen, Seq("etld1", "version_id"), "left")
      .withColumn("header_len",
        when($"total" < 2, lit(0))
          .when($"header_len_raw" >= MinRepeatedLines, $"header_len_raw").otherwise(lit(0)))
      .withColumn("footer_len0",
        when($"total" < 2, lit(0))
          .when($"footer_len_raw" >= MinRepeatedLines, $"footer_len_raw").otherwise(lit(0)))
      // overlap on short reference pages: header wins
      .withColumn("footer_len",
        when($"header_len" > 0 && $"footer_len0" > 0 &&
             $"header_len" + $"footer_len0" >= $"ref_len", lit(0))
          .otherwise($"footer_len0"))
      .select($"etld1", $"version_id", $"header_len", $"footer_len")

    // per page: does its own prefix/suffix equal the detected runs?
    val hdrEq = lineRows.join(refLines.drop("ref_len"), Seq("etld1", "version_id", "pos"))
      .join(runs, Seq("etld1", "version_id"))
      .filter($"pos" < $"header_len")
      .groupBy($"etld1", $"version_id", $"page_seq")
      .agg(sum(when($"line" === $"ref_line", 1).otherwise(0)).as("hdr_matches"))
    val ftrEq = lineRows.join(refLinesEnd, Seq("etld1", "version_id", "i"))
      .join(runs, Seq("etld1", "version_id"))
      .filter($"i" <= $"footer_len")
      .groupBy($"etld1", $"version_id", $"page_seq")
      .agg(sum(when($"line" === $"ref_line_end", 1).otherwise(0)).as("ftr_matches"))

    val perPage = refPages
      .select($"etld1", $"version_id", $"page_seq", $"url", $"n_lines", $"lines")
      .join(runs, Seq("etld1", "version_id"), "left")
      .join(hdrEq, Seq("etld1", "version_id", "page_seq"), "left")
      .join(ftrEq, Seq("etld1", "version_id", "page_seq"), "left")
      .na.fill(0, Seq("header_len", "footer_len", "hdr_matches", "ftr_matches"))
      .withColumn("drop_head",
        when($"header_len" > 0 && $"n_lines" >= $"header_len" &&
             $"hdr_matches" === $"header_len", $"header_len").otherwise(lit(0)))
      .withColumn("drop_tail",
        when($"footer_len" > 0 && ($"n_lines" - $"drop_head") >= $"footer_len" &&
             $"ftr_matches" === $"footer_len", $"footer_len").otherwise(lit(0)))
      .withColumn("body",
        array_join(slice($"lines", $"drop_head" + lit(1),
          greatest($"n_lines" - $"drop_head" - $"drop_tail", lit(0))), ""))
      .select($"etld1", $"version_id", $"page_seq", $"url", $"body")

    val stubs = tagged.filter($"is_stub")
      .select($"etld1", $"version_id", $"page_seq", $"url", lit(StubText).as("body"))

    perPage.unionByName(stubs).as[CorpusPage]
  }
}
