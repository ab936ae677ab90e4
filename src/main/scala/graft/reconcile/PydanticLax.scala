package graft.reconcile

import com.fasterxml.jackson.databind.JsonNode

/** pydantic-v2 lax-mode coercion over Jackson nodes.
  *
  * The reference's binary/desc/address parsers validate through pydantic
  * models (`ChunkBinaryClassificationResult`, `BusinessDescriptionResult`,
  * `Address` — `core/src/core/models/...`), so field acceptance follows
  * pydantic's lax conversion table, not JSON typing. This encodes the
  * table as probed empirically against pydantic 2.x (see
  * `tools/differential_parsers.py`, which generates the parity cases):
  *
  *  - bool: bool; numbers equal to 0/1; strings (trimmed, case-folded)
  *    in true/t/yes/y/on/1 | false/f/no/n/off/0;
  *  - int: bool → 0/1; integral numbers; float only when integral
  *    (5.0 → 5, 5.7 raises); strings via Python int()/float() syntax
  *    (sign, digit-group underscores, "5.0" → 5, "5.7" raises);
  *  - str: STRICT — only JSON strings (numbers do NOT coerce);
  *  - float: bool → 0.0/1.0; any number; numeric strings;
  *  - list[str]: JSON array with strictly-string elements.
  *
  * Failures throw [[PydanticLax.Invalid]]; callers map that to the
  * reference's per-field/per-entry error handling.
  */
object PydanticLax {

  final class Invalid(msg: String) extends IllegalArgumentException(msg)
  private def fail(what: String): Nothing = throw new Invalid(what)

  private def present(n: JsonNode): Boolean =
    n != null && !n.isMissingNode

  /** Python int-literal / float-literal parse (underscores between
    * digits allowed, including after the decimal point: ".5_5" → 0.55);
    * returns the double value when valid. Infinities/NaN are handled by
    * [[float]] only — Python `int("inf")` raises.
    */
  private def pyNumeric(s0: String): Option[Double] = {
    val s = s0.trim
    if (s.isEmpty) return None
    // validate underscore placement: only between digits (either side
    // of the decimal point / exponent)
    if (s.contains('_') &&
        !s.matches("[+-]?(\\d(_?\\d)*)?(\\.\\d(_?\\d)*)?([eE][+-]?\\d(_?\\d)*)?"))
      return None
    val clean = s.replace("_", "")
    if (clean.matches("[+-]?\\d+")) Some(java.lang.Double.parseDouble(clean))
    else if (clean.matches("[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?"))
      Some(java.lang.Double.parseDouble(clean))
    else None
  }

  /** Exact long from a Python int-literal-shaped string, if it is one
    * (the double round-trip in [[pyNumeric]] loses precision past 2^53).
    */
  private def pyIntExact(s0: String): Option[Long] = {
    val s = s0.trim
    if (s.contains('_') && !s.matches("[+-]?\\d(_?\\d)*")) None
    else {
      val clean = s.replace("_", "")
      if (clean.matches("[+-]?\\d+"))
        try Some(java.lang.Long.parseLong(clean)) catch { case _: Exception => None }
      else None
    }
  }

  private def toIntExact(v: Long, what: String): Int =
    if (v >= Int.MinValue && v <= Int.MaxValue) v.toInt
    // DOCUMENTED NARROWING: Python ints are unbounded; model fields here
    // are JVM Ints, so a value outside Int range raises instead of
    // silently wrapping (Jackson intValue() would wrap 3000000000 to a
    // negative number)
    else fail(s"$what: $v outside Int range")

  def bool(n: JsonNode): Boolean =
    if (!present(n) || n.isNull) fail("bool: missing/null")
    else if (n.isBoolean) n.booleanValue
    else if (n.isNumber) {
      val d = n.doubleValue
      if (d == 1.0) true else if (d == 0.0) false else fail(s"bool: $n")
    } else if (n.isTextual) n.textValue.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "true" | "t" | "yes" | "y" | "on" | "1" => true
      case "false" | "f" | "no" | "n" | "off" | "0" => false
      case other => fail(s"bool: '$other'")
    } else fail(s"bool: $n")

  def int(n: JsonNode): Int =
    if (!present(n) || n.isNull) fail("int: missing/null")
    else if (n.isBoolean) { if (n.booleanValue) 1 else 0 }
    else if (n.isIntegralNumber) toIntExact(n.longValue, "int")
    else if (n.isFloatingPointNumber) {
      val d = n.doubleValue
      if (d.isWhole) toIntExact(d.toLong, "int") else fail(s"int: $n")
    } else if (n.isTextual) pyIntExact(n.textValue) match {
      case Some(v) => toIntExact(v, "int")
      case None => pyNumeric(n.textValue) match {
        case Some(d) if d.isWhole && !d.isInfinite => toIntExact(d.toLong, "int")
        case _ => fail(s"int: '${n.textValue}'")
      }
    } else fail(s"int: $n")

  def str(n: JsonNode): String =
    if (present(n) && n.isTextual) n.textValue else fail(s"str: $n")

  def float(n: JsonNode): Double =
    if (!present(n) || n.isNull) fail("float: missing/null")
    else if (n.isBoolean) { if (n.booleanValue) 1.0 else 0.0 }
    else if (n.isNumber) n.doubleValue
    else if (n.isTextual) {
      // Python float() also accepts inf/infinity/nan with optional sign
      val t = n.textValue.trim.toLowerCase(java.util.Locale.ROOT)
      val (sign, body) =
        if (t.startsWith("+")) (1.0, t.drop(1))
        else if (t.startsWith("-")) (-1.0, t.drop(1)) else (1.0, t)
      body match {
        case "inf" | "infinity" => sign * Double.PositiveInfinity
        case "nan" => Double.NaN
        case _ => pyNumeric(n.textValue).getOrElse(fail(s"float: '${n.textValue}'"))
      }
    } else fail(s"float: $n")

  // ---- Optional[...] = None fields: missing and null both → None ---------

  def optStr(n: JsonNode): String =
    if (!present(n) || n.isNull) null else str(n)

  def optFloat(n: JsonNode): Option[Double] =
    if (!present(n) || n.isNull) None else Some(float(n))

  def optListStr(n: JsonNode): Seq[String] =
    if (!present(n) || n.isNull) Nil
    else if (n.isArray) {
      import scala.jdk.CollectionConverters._
      n.elements().asScala.map(str).toSeq
    } else fail(s"list[str]: $n")
}
