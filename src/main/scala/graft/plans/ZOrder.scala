package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional clustering key
  * behind data-skipping layouts (Delta/Iceberg `OPTIMIZE ZORDER BY`):
  * sort/bucket a 100 TB table by the z-value of its filter columns and
  * every file's min/max range narrows in ALL those dimensions at once,
  * so scans with predicates on any of them prune files — one dimension
  * of ordinary sorting can't do that.
  *
  * The z-value is plain bit arithmetic (shift/and/or), fully
  * whole-stage-codegen'd, and — like the MinHash family — expressible
  * verbatim in any engine with 64-bit integers, so the driver gate
  * oracles it in DuckDB from the SAME generated formula
  * ([[zValueSql]]).
  */
object ZOrder {

  /** Bit-interleaved z-value of `dims` non-negative integral columns:
    * bit `i` of dimension `j` lands at output position `i * d + j`.
    * With `bits` bits per dimension the result fits in `bits * d` ≤ 63
    * bits. Values are taken modulo 2^bits (callers quantize/clamp first
    * — range-rank or truncate — so dropping high bits is a documented
    * quantization, applied identically by the DuckDB twin).
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    val d = dims.length
    require(bits * d <= 63, s"bits*dims must fit a signed long: $bits*$d")
    val terms = for {
      i <- 0 until bits
      (c, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB mirror of [[zValue]] — generated from the same loop so
    * both engines interleave identically (`exprs` are SQL expressions
    * for the dimension columns, already cast/quantized the same way).
    */
  def zValueSql(exprs: Seq[String], bits: Int): String = {
    val d = exprs.length
    val terms = for {
      i <- 0 until bits
      (e, j) <- exprs.zipWithIndex
    } yield s"((($e >> $i) & 1) << ${i * d + j})"
    terms.mkString(" | ")
  }
}
