package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.vocab.{Concept, LabelMatcher}

/** Native Catalyst expression for multi-pattern word-boundary vocabulary
  * matching (the optional perf path SURVEY.md §7.4 reserves for T8).
  *
  * Versus the UDF route, this skips the ScalaUDF encoder round-trip
  * (catalyst→Scala input conversion + output converter lookup per row)
  * and keeps null handling native. The matcher itself is the same
  * single-pass [[LabelMatcher]]; `@transient lazy` compiles it once per
  * task deserialization. `doGenCode` emits a direct call into the
  * matcher's UTF8String→ArrayData entry point through the codegen
  * reference array, so a projection containing this expression stays
  * inside whole-stage codegen (a CodegenFallback here used to split the
  * q15 stage).
  */
final case class VocabMatch(
    child: Expression,
    labelToConcept: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val matcher = new LabelMatcher(labelToConcept)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // same entry point as the generated code — interpreted and codegen'd
  // evaluation cannot diverge
  override def nullSafeEval(input: Any): Any =
    matcher.matchedConceptsArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("labelMatcher", matcher, classOf[LabelMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.matchedConceptsArrayData($c);")
  }

  override def prettyName: String = "graft_vocab_match"
  override protected def withNewChildInternal(newChild: Expression): VocabMatch =
    copy(child = newChild)
}

object VocabMatch {
  def forConcepts(concepts: Seq[Concept]): Seq[(String, String)] =
    for { c <- concepts; label <- c.matchLabels.toSeq } yield (label, c.name)

  /** Column form — drop-in for `BruteSearch.searchColumn`'s UDF.
    * (Spark 4's unified `Column` wraps a ColumnNode; the classic bridge
    * converts to/from catalyst expressions.)
    */
  def matchCol(text: Column, concepts: Seq[Concept]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(VocabMatch(ColumnBridge.expression(text), forConcepts(concepts)))
  }
}
