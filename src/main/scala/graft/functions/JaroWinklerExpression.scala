package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd expression —
  * the verify stage of the fuzzy entity-resolution join (the
  * edit-distance join's [[graft.textops.EditDistance]] sibling for
  * NAME-shaped keys, where transposition tolerance and prefix weighting
  * beat a raw levenshtein radius; Winkler 1990, the record-linkage
  * standard).
  *
  * Semantics are pinned to the common reference definition, verified
  * float-for-float against DuckDB's `jaro_winkler_similarity` on every
  * blocked pair of the test dictionary (see `JaroWinklerSpec` and the
  * q109 oracle):
  *  - match window `max(|a|,|b|)/2 - 1` (floor, min 0), greedy
  *    first-free match assignment, transpositions = half the
  *    out-of-order matches;
  *  - either side empty → 0.0 (DuckDB's convention, incl. both empty);
  *  - Winkler boost `j + p·0.1·(1-j)` with shared-prefix `p` capped at
  *    4, applied only when the Jaro core exceeds 0.7 (verified: DuckDB
  *    boosts at `2.1/3 = 0.7000…01` and not at `2/3`);
  *  - float op order mirrored exactly (`(m/|a| + m/|b| + (m-t)/m)/3`,
  *    then `j + p·0.1·(1-j)` left-associated) so the gate hash-compares
  *    raw doubles with no quantization channel.
  *
  * Comparison is over UTF-16 code units (identical to code points on
  * the BMP; the oracle data is ASCII). Cost is O(|a|·window) per pair —
  * run it on blocked candidates, never as a cross-join predicate.
  */
final case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // same entry point as the generated code — interpreted and codegen'd
  // evaluation cannot diverge
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSimilarity.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JaroWinklerSimilarity.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $cls.compute($a, $b);")
  }

  override def prettyName: String = "graft_jaro_winkler"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSimilarity {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0

    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      var found = false
      while (!found && j < hi) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // transpositions: walk both matched sequences in order, count
    // positional char mismatches, halve (integer)
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2

    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro

    var p = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p.toDouble * 0.1 * (1.0 - jaro)
  }

  /** Column form. */
  def jwCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(JaroWinklerSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
