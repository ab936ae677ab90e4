package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.chunk.Chunker
import graft.vocab.LabelMatcher

/** Catalyst-visible chunking: `graft_chunks(text, soft, overlap, max)`
  * evaluates the SAME soft-limit line chunker as [[Chunker.softLimit]]
  * (whole-line chunks, exact character offsets — the identity
  * contract) but as a scalar expression returning
  * `array<struct<chunk_start,chunk_end,text,tokens>>`, so the chunk
  * explode becomes a `Generate(Explode(…))` the OPTIMIZER can see and
  * rules like [[graft.plans.VocabBelowExplode]] can rewrite around —
  * the typed-`flatMap` form ([[graft.pipeline.Orchestrator]]) is
  * opaque to Catalyst by construction. Token counting is pinned to
  * [[WhitespaceTokenizer]] (an expression cannot carry an injectable
  * trait through SQL; callers needing another tokenizer use the typed
  * path). `maxChunks <= 0` means unlimited.
  */
final case class ChunkSplit(
    child: Expression,
    softLimitTokens: Int,
    overlapRatio: Double,
    maxChunks: Int)
    extends UnaryExpression {

  require(softLimitTokens > 0, s"softLimitTokens must be positive: $softLimitTokens")
  require(overlapRatio >= 0.0 && overlapRatio < 1.0,
    s"overlapRatio must be in [0, 1): $overlapRatio")

  override def dataType: DataType = ChunkSplit.Schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ChunkSplit.chunksArrayData(input.asInstanceOf[UTF8String],
      softLimitTokens, overlapRatio, maxChunks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ChunkSplit.chunksArrayData(
         |  $c, $softLimitTokens, $overlapRatio, $maxChunks);""".stripMargin)

  override def prettyName: String = "graft_chunks"
  override protected def withNewChildInternal(newChild: Expression): ChunkSplit =
    copy(child = newChild)
}

object ChunkSplit {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("chunk_start", IntegerType, nullable = false),
    StructField("chunk_end", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tokens", IntegerType, nullable = false))),
    containsNull = false)

  /** Shared interpreted/codegen entry point. */
  def chunksArrayData(text: UTF8String, soft: Int, overlap: Double,
      max: Int): GenericArrayData = {
    val chunks = Chunker.softLimit(text.toString, soft, overlap,
      if (max > 0) Some(max) else None, WhitespaceTokenizer)
    new GenericArrayData(chunks.map(c => InternalRow(
      c.chunk_start, c.chunk_end, UTF8String.fromString(c.text),
      c.tokens)).toArray[Any])
  }

  def chunksCol(text: Column, soft: Int, overlap: Double,
      max: Int = 0): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ChunkSplit(ColumnBridge.expression(text), soft, overlap, max))
  }
}

/** `graft_vocab_spans(text, labels, names)` — the pre-explode half of
  * the vocab-below-explode rewrite: LINE-grain match spans
  * ([[LabelMatcher.lineSpans]]; see its scaladoc for the equivalence
  * argument) as `array<struct<concept,start,end>>` in original
  * character coordinates. One scan of the document regardless of how
  * many chunks it explodes into.
  */
final case class VocabMatchSpans(
    child: Expression,
    labelToConcept: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val matcher = new LabelMatcher(labelToConcept)

  override def dataType: DataType = VocabMatchSpans.Schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    matcher.lineSpansArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("labelMatcher", matcher, classOf[LabelMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.lineSpansArrayData($c);")
  }

  override def prettyName: String = "graft_vocab_spans"
  override protected def withNewChildInternal(newChild: Expression): VocabMatchSpans =
    copy(child = newChild)
}

object VocabMatchSpans {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("concept", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))),
    containsNull = false)
}

/** `graft_vocab_slice(spans, start, end)` — the post-explode half:
  * sorted distinct concepts of the spans lying wholly inside
  * `[start, end)`. For spans from [[VocabMatchSpans]] and a chunk's
  * `[chunk_start, chunk_end)`, this equals
  * `graft_vocab_match(chunk.text)` exactly (chunks are whole-line
  * spans; [[LabelMatcher.lineSpans]] scaladoc carries the proof).
  */
final case class VocabSpansSlice(
    spans: Expression,
    start: Expression,
    end: Expression)
    extends TernaryExpression {

  override def first: Expression = spans
  override def second: Expression = start
  override def third: Expression = end

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any, lo: Any, hi: Any): Any =
    VocabSpansSlice.slice(s.asInstanceOf[ArrayData],
      lo.asInstanceOf[Int], hi.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, lo, hi) =>
      s"${ev.value} = graft.functions.VocabSpansSlice.slice($s, $lo, $hi);")

  override def prettyName: String = "graft_vocab_slice"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): VocabSpansSlice =
    VocabSpansSlice(newFirst, newSecond, newThird)
}

object VocabSpansSlice {
  /** Shared interpreted/codegen entry point: sorted distinct concepts
    * with `start >= lo && end <= hi` — the same (sorted-set) order
    * [[LabelMatcher.matchedConcepts]] emits.
    */
  def slice(spans: ArrayData, lo: Int, hi: Int): GenericArrayData = {
    val found = scala.collection.mutable.SortedSet.empty[String]
    var i = 0
    val n = spans.numElements()
    while (i < n) {
      val row = spans.getStruct(i, 3)
      if (row.getInt(1) >= lo && row.getInt(2) <= hi)
        found += row.getUTF8String(0).toString
      i += 1
    }
    new GenericArrayData(
      found.toSeq.map(UTF8String.fromString).toArray[Any])
  }
}
