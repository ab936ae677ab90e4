package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table, computed in ONE
  * aggregation pass (the Deequ-style shape: every metric is an
  * algebraic aggregate, so a 100 TB audit costs one scan with map-side
  * partial aggregation — never one job per check).
  *
  * Metrics are exact fractions (long counts divided once, in double, at
  * the end — the engine-wide float policy), so a report is
  * deterministic and gate-hashable.
  */
object Constraints {

  sealed trait Check {
    def name: String
    /** The aggregate expression producing this check's metric. */
    private[Constraints] def agg: Column
  }

  /** Fraction of rows with a non-null value. */
  final case class Completeness(column: String) extends Check {
    val name = s"completeness($column)"
    private[Constraints] def agg =
      count(col(column)).cast("double") / count(lit(1))
  }

  /** Fraction of rows whose (composite) key is unique across the table:
    * 1.0 means the columns form a key. */
  final case class Uniqueness(columns: Seq[String]) extends Check {
    val name = s"uniqueness(${columns.mkString(",")})"
    private[Constraints] def agg =
      count_distinct(struct(columns.map(col): _*)).cast("double") / count(lit(1))
  }

  /** Fraction of non-null values inside [lo, hi] (inclusive). With NO
    * non-null values the conformance is VACUOUSLY 1.0 (an explicit
    * policy, not a 0/0 NULL that is neither pass nor fail — nullness
    * itself is [[Completeness]]'s job to flag).
    */
  final case class RangeConformance(column: String, lo: Double, hi: Double) extends Check {
    val name = s"range($column,[$lo,$hi])"
    private[Constraints] def agg =
      coalesce(
        try_divide( // ANSI-safe: a zero denominator is NULL, not an error
          sum(when(col(column).between(lo, hi), 1L).otherwise(0L)).cast("double"),
          sum(when(col(column).isNotNull, 1L).otherwise(0L))),
        lit(1.0))
  }

  /** Fraction of non-null values in the allowed set; vacuously 1.0 over
    * zero non-null values, like [[RangeConformance]].
    */
  final case class Membership(column: String, allowed: Seq[String]) extends Check {
    val name = s"membership($column)"
    private[Constraints] def agg =
      coalesce(
        try_divide(
          sum(when(col(column).isin(allowed: _*), 1L).otherwise(0L)).cast("double"),
          sum(when(col(column).isNotNull, 1L).otherwise(0L))),
        lit(1.0))
  }

  /** One row per check: `(check, metric, passed)` with `passed` =
    * metric ≥ its minimum. The whole report is a single `agg` over the
    * input — `explain` shows one aggregate, no joins, no extra scans.
    * The stacking is built from Column expressions (inline over an
    * array of structs), never interpolated SQL text — a check name
    * containing a quote is data, not syntax.
    */
  def report(df: DataFrame, checks: Seq[(Check, Double)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val row = df.agg(checks.head._1.agg.as("m0"),
      checks.tail.zipWithIndex.map { case ((c, _), i) => c.agg.as(s"m${i + 1}") }: _*)
    val stacked = checks.zipWithIndex.map { case ((c, min), i) =>
      struct(lit(c.name).as("check"), col(s"m$i").as("metric"),
        (col(s"m$i") >= lit(min)).as("passed"))
    }
    row.select(inline(array(stacked: _*)))
  }
}
