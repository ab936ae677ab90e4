package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Explode, Expression, GetStructField, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{ChunkSplit, VocabMatch, VocabMatchSpans, VocabSpansSlice}

/** Optimizer rule: push vocabulary matching BELOW the chunk explode —
  * SURVEY §4's second named perf-rule candidate, generalized.
  *
  * Recognized shape (what `graft_chunks` + `explode` + `graft_vocab_match`
  * compose to after analysis):
  * {{{
  * Project[…, graft_vocab_match(chunk.text, labels, names), …]
  *   Generate(Explode(graft_chunks(text, soft, overlap, max)), … , [chunk])
  *     child
  * }}}
  * Rewritten to compute ONE set of line-grain match spans per document
  * row below the Generate ([[VocabMatchSpans]]) and slice it per chunk
  * above it ([[VocabSpansSlice]]): the vocabulary scan runs once per
  * DOCUMENT instead of once per CHUNK — at overlap 0.15 that also
  * stops re-scanning every overlap region, and the per-chunk work
  * drops to a span-range filter.
  *
  * SOUNDNESS — stronger than SURVEY §4's "legal at overlap=0"
  * conjecture: chunks are assembled from WHOLE LINES
  * ([[graft.chunk.Chunker]]), so every chunk is a contiguous
  * `[chunk_start, chunk_end)` span of the original text with
  * boundaries immediately after line terminators, at ANY overlap
  * ratio and under `maxChunks` truncation. Provided no label contains
  * a line-terminator character (checked here, at plan time, against
  * exactly [[graft.ingest.Blocks.splitKeepEnds]]'s terminator set), a
  * match and all context it consults stay within one line —
  * [[graft.vocab.LabelMatcher.lineSpans]]'s scaladoc carries the
  * word-boundary and final-sigma argument — so
  * `matchedConcepts(chunk.text)` ≡ sorted distinct concepts of the
  * spans inside the chunk's range. A label WITH a terminator (which
  * could legitimately match across a chunk's constituent lines) simply
  * leaves the plan untouched. `VocabBelowExplodeSpec` pins the
  * rewrite and byte-identical results, terminator-zoo and Unicode
  * corpora included.
  *
  * Install: `spark.sql.extensions=graft.GraftExtensions`
  * (`injectOptimizerRule`) or [[graft.GraftExtensions.install]]
  * (`spark.experimental.extraOptimizations`). Fires once: the rewrite
  * leaves no `graft_vocab_match(chunk.text)` behind to re-match.
  */
object VocabBelowExplode extends Rule[LogicalPlan] {

  /** [[graft.ingest.Blocks.splitKeepEnds]]'s terminator set — the
    * characters a chunk boundary can sit after.
    */
  private val Terminators: Set[Char] = Set(
    '\n', '\r', '\u000B', '\u000C', '\u001C', '\u001D', '\u001E',
    '\u0085', '\u2028', '\u2029')

  private def terminatorFree(labelToConcept: Seq[(String, String)]): Boolean =
    labelToConcept.forall(!_._1.exists(Terminators.contains))

  /** The chunk struct's field positions ([[ChunkSplit.Schema]]). */
  private val StartField = 0
  private val EndField = 1
  private val TextField = 2

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        g @ Generate(Explode(cs: ChunkSplit), _, false, _, genOut, child))
        if genOut.size == 1 =>
      val chunkAttr = genOut.head
      def isChunkText(e: Expression): Boolean = e match {
        case GetStructField(a: AttributeReference, TextField, _) =>
          a.exprId == chunkAttr.exprId
        case _ => false
      }
      val vocabs = projList.flatMap(_.collect {
        case VocabMatch(t, l2c) if isChunkText(t) && terminatorFree(l2c) => l2c
      }).distinct
      if (vocabs.isEmpty) p
      else {
        val spanAlias = vocabs.zipWithIndex.map { case (v, i) =>
          v -> Alias(VocabMatchSpans(cs.child, v), s"__vocab_spans_$i")()
        }
        val byVocab = spanAlias.toMap
        // spans ride the Generate as pass-through child columns (the
        // appended aliases keep every existing unrequiredChildIndex
        // position valid)
        val newChild = Project(
          child.output ++ spanAlias.map(_._2), child)
        val newGen = g.copy(child = newChild)
        val newProj = projList.map(_.transformDown {
          case VocabMatch(t, l2c) if isChunkText(t) && byVocab.contains(l2c) =>
            VocabSpansSlice(byVocab(l2c).toAttribute,
              GetStructField(chunkAttr, StartField, Some("chunk_start")),
              GetStructField(chunkAttr, EndField, Some("chunk_end")))
        }.asInstanceOf[NamedExpression])
        Project(newProj, newGen)
      }
  }
}
