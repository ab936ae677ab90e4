package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native twin of the dedup-key regex chain
  * ([[graft.textops.TextTokens.dedupKeyCol]]'s normalization: digit
  * runs → `0`, non-`[a-z0-9]` runs → space, whitespace collapse,
  * trim). The chain itself is three `regexp_replace` passes — three
  * full scans with two intermediate string allocations per row, the
  * dominant cost of the normalized-dedup key at corpus scale (it runs
  * once per document in q81/q172's key derivation). This expression
  * produces byte-identical output in ONE branch-predictable byte scan
  * with one output allocation, and stays inside whole-stage codegen
  * (`doGenCode` emits a static call, the
  * [[JaroWinklerSimilarity]] discipline).
  *
  * INPUT CONTRACT: the child must already be lowercased (compose as
  * `DedupKeyNormalize(Lower(text))` via [[dedupKeyCol]]). Lowercasing
  * stays a separate Spark-native step on purpose: Spark's `lower` has
  * Unicode mappings that can PRODUCE ASCII letters (U+212A KELVIN SIGN
  * → `k`), so folding case inside the byte scan would silently diverge
  * from the regex chain the DuckDB oracles mirror.
  *
  * Byte-level classification is exact for the chain's EXPLICIT-ASCII
  * character classes: every byte ≥ 0x80 (any part of any non-ASCII
  * code point) falls in the "other" class, and a maximal run of
  * other/whitespace bytes collapses to one space exactly as the
  * step-3-then-step-4 regex composition does. Digit runs in the input
  * are digit runs of the original string (steps 3/4 never merge two
  * digit runs — the separator becomes a space, not nothing), so
  * emitting a single `0` per scan-time run is equivalent to step 2
  * running first. Output is pure ASCII `[a-z0 ]`.
  */
final case class DedupKeyNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DedupKeyNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DedupKeyNormalize.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }

  override def prettyName: String = "graft_dedup_key"
  override protected def withNewChildInternal(
      newChild: Expression): DedupKeyNormalize = copy(child = newChild)
}

object DedupKeyNormalize {

  /** Static entry point shared by interpreted eval and generated code.
    * One forward scan; `pendingSpace` carries the collapsed separator
    * and is only emitted before the next kept byte (never at the
    * start, never at the end — that IS the trim).
    */
  def compute(u: UTF8String): UTF8String = {
    val in = u.getBytes
    val n = in.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = in(i)
      if (b >= 'a' && b <= 'z') {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b
        o += 1
        i += 1
      } else if (b >= '0' && b <= '9') {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = '0'
        o += 1
        i += 1
        while (i < n && in(i) >= '0' && in(i) <= '9') i += 1
      } else {
        // the chain's whitespace class (space \t \n \x0B \f \r) and
        // every other byte — including all bytes of multi-byte code
        // points — reduce to one separator space
        pendingSpace = true
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** `normalize(lower(text))` as a Column — the composition
    * [[graft.textops.TextTokens.dedupKeyCol]] publishes. */
  def dedupKeyCol(text: Column): Column =
    ColumnBridge.column(DedupKeyNormalize(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text))))
}
