package graft.vocab

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Brute vocabulary search (SURVEY.md T8; reference
  * `data_etl_app/src/data_etl_app/services/brute_search_service.py:9-29`):
  * a concept matches a text when any of its `matchLabels` occurs
  * case-insensitively at word boundaries — `(?<!\w)label(?=\W|$)`.
  *
  * The reference re-scans the text once per label per call. Here the
  * matcher is a single left-to-right scan: label candidates are bucketed
  * by first character, tried only at positions preceded by a non-word
  * character, and confirmed with a region compare + trailing-boundary
  * check. One pass over the text regardless of vocabulary size — the
  * chunk × vocabulary hot path at 100 TB. The compiled matcher is built
  * once per executor from the broadcast vocabulary (lazy in the UDF
  * closure), never per row.
  */
final class LabelMatcher(labelToConcept: Seq[(String, String)]) extends Serializable {

  /** (lowercased label, concept name), bucketed by first char. */
  @transient private lazy val buckets: Map[Char, Array[(String, String)]] =
    labelToConcept
      .filter(_._1.nonEmpty)
      .map { case (l, c) => (l.toLowerCase(java.util.Locale.ROOT), c) }
      .distinct
      .groupBy(_._1.charAt(0))
      .view.mapValues(_.toArray).toMap

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Names of concepts with ≥1 label match in `text` (dedup'd, sorted
    * for deterministic downstream arrays).
    */
  def matchedConcepts(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val found = scala.collection.mutable.SortedSet.empty[String]
    var i = 0
    val n = lower.length
    while (i < n) {
      if (i == 0 || !isWordChar(lower.charAt(i - 1))) {
        buckets.get(lower.charAt(i)) match {
          case Some(candidates) =>
            var k = 0
            while (k < candidates.length) {
              val (label, concept) = candidates(k)
              if (!found.contains(concept) &&
                  lower.regionMatches(i, label, 0, label.length)) {
                val end = i + label.length
                if (end == n || !isWordChar(lower.charAt(end))) found += concept
              }
              k += 1
            }
          case None =>
        }
      }
      i += 1
    }
    found.toSeq
  }

  /** Codegen entry point ([[graft.functions.VocabMatch]]'s generated
    * Java calls this): UTF8String in, Catalyst array of UTF8String out —
    * no per-row encoder conversions.
    */
  def matchedConceptsArrayData(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val names = matchedConcepts(text.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      names.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
  }

  /** LINE-grain match spans: for every line of `text` (Python
    * `splitlines(keepends)` boundaries — [[graft.ingest.Blocks
    * .splitKeepEnds]], the exact splitter the chunkers build on) and
    * every concept with ≥1 label match in that line, one
    * `(concept, lineStart, lineEnd)` span in ORIGINAL character
    * coordinates.
    *
    * Why line grain is the factoring that makes chunk-level rewrites
    * sound: provided no label contains a line-terminator character, a
    * match can never cross a line boundary, and every piece of CONTEXT
    * a match consults stays inside its line too — the word-boundary
    * check looks one char past each end (a terminator, which is
    * non-word, or the line/string edge, same verdict), and
    * `toLowerCase`'s only context-sensitive rule in Locale.ROOT
    * (Greek final sigma) keys on adjacent cased letters, which a
    * terminator is not. So for ANY chunk assembled from whole lines —
    * soft/hard-limit chunks at any overlap — `matchedConcepts(chunk
    * .text)` equals the sorted distinct concepts of the spans lying
    * inside `[chunk_start, chunk_end)`; this also dodges the
    * lowercase-length-change hazard (U+0130) entirely, because spans
    * carry original LINE offsets, never offsets into a lowercased
    * string. [[graft.plans.VocabBelowExplode]] rewrites on exactly
    * this equivalence; `VocabBelowExplodeSpec` pins it differentially
    * (final-sigma, U+0130, and terminator-zoo corpora included).
    */
  def lineSpans(text: String): Seq[(String, Int, Int)] = {
    if (text == null || text.isEmpty) return Nil
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = 0
    graft.ingest.Blocks.splitKeepEnds(text).foreach { line =>
      matchedConcepts(line).foreach { c => out += ((c, off, off + line.length)) }
      off += line.length
    }
    out.result()
  }

  /** Codegen entry point for [[graft.functions.VocabMatchSpans]]. */
  def lineSpansArrayData(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val rows = lineSpans(text.toString).map { case (c, s, e) =>
      InternalRow(UTF8String.fromString(c), s, e)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray[Any])
  }
}

object BruteSearch {

  def matcherFor(concepts: Seq[Concept]): LabelMatcher =
    new LabelMatcher(for {
      c <- concepts
      label <- c.matchLabels.toSeq
    } yield (label, c.name))

  /** Set-level parity surface with the reference's
    * `brute_search(text, concepts) -> set[Concept]`.
    */
  def search(text: String, concepts: Seq[Concept]): Set[String] =
    matcherFor(concepts).matchedConcepts(text).toSet

  /** Chunk-level Dataset form: adds `brute_concepts: array<string>` of
    * matched concept names. The vocabulary rides the expression/closure
    * (it is broadcast with the task binary — ≤ a few thousand strings).
    *
    * Default path is the native Catalyst expression
    * ([[graft.functions.VocabMatch]]) — no ScalaUDF encoder round-trip;
    * `native = false` selects the UDF form (which maps null text to an
    * empty array instead of null).
    */
  def searchColumn(df: DataFrame, textCol: String, concepts: Seq[Concept],
      outCol: String = "brute_concepts", native: Boolean = true): DataFrame = {
    if (native) {
      df.withColumn(outCol,
        graft.functions.VocabMatch.matchCol(col(textCol), concepts))
    } else {
      val matcher = matcherFor(concepts)
      val u = udf((text: String) => matcher.matchedConcepts(text))
      df.withColumn(outCol, u(col(textCol)))
    }
  }
}
