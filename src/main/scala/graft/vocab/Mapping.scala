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

  /** T10 as a distributed join: input rows carry `resultsCol:
    * array<string>`; output gains `matched_concepts` and
    * `unmatched_keywords` (both sorted for determinism). Equivalent to
    * [[matchAndSplit]]: a result is consumed iff it is a label of some
    * known concept, and a concept matches iff any label is present.
    * The label table is broadcast — never a shuffle of the fact side.
    */
  def matchAndSplitDf(
      df: DataFrame,
      resultsCol: String,
      known: Seq[Concept]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val labelRows = known.flatMap(c => c.matchLabels.toSeq.map(l => (l, c.name)))
      .toDF("label", "concept_name")
    val rowId = monotonically_increasing_id()
    val withId = df.withColumn("__row_id", rowId)
    val exploded = withId.select($"__row_id", explode_outer(col(resultsCol)).as("result"))
    val joined = exploded.join(broadcast(labelRows), $"result" === $"label", "left")
    val agg = joined.groupBy($"__row_id").agg(
      sort_array(array_distinct(collect_list(when($"concept_name".isNotNull, $"concept_name"))))
        .as("matched_concepts"),
      sort_array(array_distinct(collect_list(when($"concept_name".isNull, $"result"))))
        .as("unmatched_keywords"))
    withId.join(agg, "__row_id").drop("__row_id")
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
