package graft.vocab

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary splits and unknown→known mapping (SURVEY.md T10/T12/T26).
  */
object Mapping {

  /** T10 — split LLM search results into matched known concepts and
    * unmatched keywords (reference
    * `extract_concept_service.py:339-349`): a concept matches when its
    * labels intersect the results; every result that equals any matched
    * concept's label is consumed.
    */
  def matchAndSplit(
      known: Seq[Concept],
      results: Set[String]): (Set[String], Set[String]) = {
    var matched = Set.empty[String]
    var unmatched = results
    known.foreach { kc =>
      val common = kc.matchLabels.intersect(results)
      if (common.nonEmpty) {
        matched += kc.name
        unmatched --= common
      }
    }
    (matched, unmatched)
  }

  /** T10 per row over `resultsCol: array<string>`: output gains
    * `matched_concepts` and `unmatched_keywords` (both sorted for
    * determinism). The vocabulary rides the closure (broadcast with the
    * task binary); the per-row set math is exactly [[matchAndSplit]].
    *
    * Deliberately NOT an explode + join-back-by-synthetic-id plan: a
    * `monotonically_increasing_id` join key is recomputed independently
    * on each side of the self-join and is unstable under
    * nondeterministic upstream row order, which silently pairs rows
    * with each other's results.
    */
  def matchAndSplitDf(
      df: DataFrame,
      resultsCol: String,
      known: Seq[Concept]): DataFrame = {
    val vocab = known
    val split = udf((results: Seq[String]) => {
      val (m, u) = matchAndSplit(vocab, Option(results).getOrElse(Nil).toSet)
      (m.toSeq.sorted, u.toSeq.sorted)
    })
    df.withColumn("__split", split(col(resultsCol)))
      .withColumn("matched_concepts", col("__split._1"))
      .withColumn("unmatched_keywords", col("__split._2"))
      .drop("__split")
  }

  /** T12 pure part — apply a raw LLM `{unknown -> known_label}` mapping
    * (reference `map_known_to_unknown_service.py:158-210`):
    * hallucinated unknowns (not in `keywordsToMap`) are dropped; null or
    * unknown known-labels are dropped; later concepts win duplicate
    * labels (dict-comprehension order). Returns the grouped
    * known→unknowns map and the left-over unmapped unknowns.
    */
  def applyMapping(
      known: Seq[Concept],
      keywordsToMap: Set[String],
      rawMapping: Map[String, String]): (Map[String, Set[String]], Set[String]) = {
    val labelMap: Map[String, String] =
      known.flatMap(k => k.matchLabels.toSeq.map(l => (l, k.name))).toMap
    var knownToUnknowns = Map.empty[String, Set[String]]
    rawMapping.foreach { case (mu, mkLabel) =>
      if (keywordsToMap.contains(mu) && mkLabel != null && mkLabel.nonEmpty) {
        labelMap.get(mkLabel).foreach { conceptName =>
          knownToUnknowns = knownToUnknowns.updated(
            conceptName, knownToUnknowns.getOrElse(conceptName, Set.empty) + mu)
        }
      }
    }
    val mapped = knownToUnknowns.values.foldLeft(Set.empty[String])(_ union _)
    (knownToUnknowns, keywordsToMap.diff(mapped))
  }

  /** T26 — dummy-completion short-circuit (reference
    * `extract_concept_deferred_service.py:261-335`): when no unknowns
    * need mapping, the mapping "response" is an empty object — no LLM
    * round-trip. Column form: `when(size(unmatched)=0, "{}")`.
    */
  def dummyMappingResponse(unmatchedCol: String): org.apache.spark.sql.Column =
    when(size(col(unmatchedCol)) === 0, lit("{}"))
}
