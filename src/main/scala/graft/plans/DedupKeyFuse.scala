package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, RegExpReplace, StringTrim}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.DedupKeyNormalize
import graft.textops.TextTokens

/** Optimizer rule: rewrite the DOCUMENTED three-pass dedup-key
  * `regexp_replace` chain into the fused single-scan codegen
  * expression [[DedupKeyNormalize]] — the engine's first injected
  * `Rule[LogicalPlan]` (SURVEY §4's named perf-rule candidate; the
  * native-Expression half landed in round 10, this is the half that
  * rescues users who AUTHOR the chain).
  *
  * The chain it recognizes is exactly
  * [[graft.textops.TextTokens.dedupKeyRegexCol]] — the form the docs
  * publish, every DuckDB oracle mirrors, and any SQL/DataFrame user
  * composes by hand:
  * {{{
  * trim(regexp_replace(regexp_replace(regexp_replace(
  *   <expr>, '[0-9]+', '0'),
  *   '[^a-z0-9 \t\n\x0B\f\r]+', ' '),
  *   '[ \t\n\x0B\f\r]+', ' '))
  * }}}
  * Each pass is a full scan with an intermediate string allocation per
  * row; the fused expression is one branch-predictable byte scan with
  * one output allocation (q81's round-10 fix: 2.20 s → 0.54 s at
  * sf0.1). The rewrite fires on the exact pattern/replacement/position
  * literals only — any other chain is left alone.
  *
  * EQUIVALENCE (why the `Lower` wrapper is NOT required for the
  * rewrite, though [[TextTokens.dedupKeyCol]] composes one): the
  * chain's step-2/step-3 character classes are explicit ASCII, so any
  * byte outside `[a-z0-9]` and the six whitespace chars — including
  * every uppercase letter and every byte of a multi-byte code point —
  * falls in step 3's "other" class and collapses (with adjacent
  * whitespace, via step 4) to one separator space. The fused scan
  * classifies bytes identically (`DedupKeyNormalize.compute` keeps
  * `[a-z]`, folds `[0-9]+` runs to `0`, and turns every other byte
  * into a pending separator), so `DedupKeyNormalize(e)` is
  * byte-identical to the chain over ANY input expression `e`,
  * lowercased or not. `DedupKeySpec` differentially pins this on the
  * mixed-case corpus; `DedupKeyFuseSpec` pins the plan rewrite and
  * result identity end-to-end.
  *
  * Install: config `spark.sql.extensions=graft.GraftExtensions`
  * (via `injectOptimizerRule`), or imperatively on a live session
  * with [[graft.GraftExtensions.install]]
  * (`spark.experimental.extraOptimizations` — runs after the main
  * optimizer batches, same fixed-point semantics).
  */
object DedupKeyFuse extends Rule[LogicalPlan] {

  private def strLit(e: Expression, want: String): Boolean = e match {
    case Literal(u: UTF8String, _: StringType) => u.toString == want
    case _ => false
  }

  private def posOne(e: Expression): Boolean = e match {
    case Literal(1, IntegerType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.REGEXP_REPLACE)) {
      case StringTrim(
          RegExpReplace(
            RegExpReplace(
              RegExpReplace(src, p1, r1, q1),
              p2, r2, q2),
            p3, r3, q3),
          None)
        if strLit(p1, TextTokens.DedupDigitsRe) && strLit(r1, "0") &&
          strLit(p2, TextTokens.DedupOtherRe) && strLit(r2, " ") &&
          strLit(p3, TextTokens.DedupWsRe) && strLit(r3, " ") &&
          posOne(q1) && posOne(q2) && posOne(q3) =>
        DedupKeyNormalize(src)
    }
}
