package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native symmetric-delete neighborhood of order 1: the string plus
  * every single-character deletion, first-occurrence-deduped — the
  * candidate key set of the FastSS/SymSpell edit-distance join
  * ([[graft.textops.EditDistance]]).
  *
  * Replaces the `array_union(array(s), transform(sequence(...), ...))`
  * formulation: higher-order functions are CodegenFallback, so the
  * variant explode — the fan-out stage of the whole join — paid
  * interpreted lambda dispatch plus per-variant `substr` allocations.
  * This expression builds the neighborhood in one pass inside
  * whole-stage codegen.
  *
  * Deletions are by CODE POINT (what Spark's `length`/`substr` count),
  * in position order after the original string, first occurrence kept —
  * exactly the composed form's order and dedup semantics (spec'd
  * equal, including supplementary characters and repeated chars).
  */
final case class DeletionVariants(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_deletion_variants"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    variantsJava(a.asInstanceOf[UTF8String])

  /** Shared by interpreted eval and generated code. */
  def variantsJava(s: UTF8String): ArrayData = {
    val out = DeletionVariants.neighborhood(s.toString)
    val arr = new Array[Any](out.length)
    var k = 0
    while (k < out.length) { arr(k) = UTF8String.fromString(out(k)); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("deletionVariants", this, classOf[DeletionVariants].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.variantsJava($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeletionVariants =
    copy(child = newChild)
}

object DeletionVariants {
  def variants(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DeletionVariants(ColumnBridge.expression(s)))
  }

  /** The order-1 deletion neighborhood on plain strings — ONE definition
    * of the code-point deletion semantics, shared by the expression and
    * the `graft_deletion_variants` SQL UDF (a UTF-16 re-implementation
    * would emit lone-surrogate variants for non-BMP input).
    */
  def neighborhood(str: String): IndexedSeq[String] = {
    val cps = str.codePoints().toArray
    val out = new java.util.LinkedHashSet[String]()
    out.add(str)
    var i = 0
    while (i < cps.length) {
      val sb = new java.lang.StringBuilder(str.length)
      var j = 0
      while (j < cps.length) {
        if (j != i) sb.appendCodePoint(cps(j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    out.asScala.toIndexedSeq
  }
}
