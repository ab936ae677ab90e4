package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.functions.VocabMatch

/** Session extension wiring (the `SparkSessionExtensions` path —
  * SURVEY.md §7.4's extension-point story): registers the native
  * [[VocabMatch]] expression under SQL name `graft_vocab_match`.
  *
  * Usage (config-driven, no code):
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * SELECT graft_vocab_match(text, array('CNC','CNC Machining'),
  *                                 array('CNC Machining','CNC Machining'))
  * }}}
  * Args 2/3 are parallel FOLDABLE arrays (labels, concept names) —
  * resolved to the expression's compiled matcher at plan time, so SQL
  * callers get the same single-pass matcher as the DataFrame API.
  * (`Graft.registerAll` covers the plain-UDF functions; this class is
  * the injection route for native expressions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_vocab_match"),
      new ExpressionInfo(classOf[VocabMatch].getName, "graft_vocab_match"),
      (children: Seq[Expression]) => GraftExtensions.buildVocabMatch(children)))
    ext.injectFunction((
      new FunctionIdentifier("graft_dedup_key"),
      new ExpressionInfo(
        classOf[graft.functions.DedupKeyNormalize].getName, "graft_dedup_key"),
      (children: Seq[Expression]) => GraftExtensions.buildDedupKey(children)))
    // optimizer rule: the authored three-pass dedup-key regex chain
    // fuses to the single-scan codegen expression at plan time
    ext.injectOptimizerRule(_ => graft.plans.DedupKeyFuse)
  }
}

object GraftExtensions {

  private def literalStrings(e: Expression, what: String): Seq[String] = {
    require(e.foldable, s"graft_vocab_match: $what must be a foldable array literal")
    e.eval(null) match {
      case a: ArrayData =>
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      case other =>
        throw new IllegalArgumentException(
          s"graft_vocab_match: $what must be an array of strings, got $other")
    }
  }

  private[graft] def buildVocabMatch(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "graft_vocab_match(text, labels_array, concept_names_array)")
    val labels = literalStrings(children(1), "labels")
    val names = literalStrings(children(2), "concept names")
    require(labels.length == names.length,
      s"graft_vocab_match: ${labels.length} labels vs ${names.length} concept names")
    VocabMatch(children.head, labels.zip(names))
  }

  /** `graft_dedup_key(text)` — the fused normalized-dedup key over
    * `lower(text)` (the [[graft.textops.TextTokens.dedupKeyCol]]
    * composition), so SQL callers hash/group on the exact same key as
    * the DataFrame dedup operators.
    */
  private[graft] def buildDedupKey(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_dedup_key(text)")
    graft.functions.DedupKeyNormalize(
      org.apache.spark.sql.catalyst.expressions.Lower(children.head))
  }

  /** Imperative registration for sessions built without the config:
    * the SQL functions land in the function registry, and the
    * [[graft.plans.DedupKeyFuse]] rewrite lands in
    * `spark.experimental.extraOptimizations` (a post-optimizer batch —
    * same fixed-point semantics as `injectOptimizerRule`, applied to
    * every query planned after this call). Idempotent.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vocab_match", buildVocabMatch, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dedup_key", buildDedupKey, "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DedupKeyFuse))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DedupKeyFuse
  }
}
