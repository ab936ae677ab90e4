package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution by pointer doubling — the step between
  * URL canonicalization ([[graft.functions.UrlUtil.canonicalUrl]]
  * collides SPELLINGS of one resource) and frontier dedup: HTTP
  * 301/308 chains mean the fetch log holds `a→b, b→c, c→d`, and every
  * downstream key (dedup, in-degree, recrawl) wants `a→d`. The naive
  * per-hop walk is one join per hop; pointer doubling composes the map
  * with itself — `f_{k+1}(x) = f_k(f_k(x))` — so `rounds` keyed
  * self-joins resolve every chain up to `2^rounds` hops (Wyllie's
  * list-ranking step, the classic log-depth formulation).
  *
  * Input must be FUNCTIONAL: at most one outgoing redirect per source
  * URL (HTTP gives you that; the precondition is enforced up front —
  * a duplicate source would silently multiply rows through every
  * doubling). Cycles (`a→b→a`) never terminate: after the fixed
  * rounds such a source reports wherever the doubling landed with
  * `terminal = 0`, exactly like a chain longer than `2^rounds` — the
  * caller either raises `rounds` or quarantines non-terminal rows
  * (production crawlers cap redirects at 5-10 hops anyway, so
  * `rounds = 4` covers the real web).
  *
  * Emits `(src, target, hops, terminal)`: the resolved endpoint, the
  * EXACT hop count walked (sums through the doubling, so it is the
  * true chain length when terminal), and terminal = 1 iff the target
  * has no outgoing redirect.
  *
  * Scale shape: each doubling is ONE equi-join of the map with itself
  * on the chain key — `log₂(maxHops)` keyed shuffles total where the
  * per-hop walk needs `maxHops` (30-hop chains: 5 joins vs 30); each
  * round cuts its lineage with an eager localCheckpoint because the
  * round reads the map TWICE (left side and composed side — left
  * lazy, the plan doubles per round, the PageRank-redistributed
  * situation); the final terminal probe is one more keyed join against
  * the original edge list.
  */
object Redirects {

  def resolve(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be non-negative: $rounds")
    // materialized once: three consumers (functionality probe, initial
    // map, terminal probe) would otherwise each re-derive the edge
    // frame from the source. Size bound for the localCheckpoint
    // (executor-local, not fault tolerant): the map is FUNCTIONAL —
    // one outgoing edge per source, enforced below — so the frame is
    // one narrow row per redirecting URL, a small fraction of the
    // crawl's URL table (redirects are ~single-digit % of responses).
    // An executor loss fails and re-runs the query; at a scale where
    // that is unacceptable, point spark.checkpoint.dir at reliable
    // storage and switch this (and hostGraph's edges) to checkpoint().
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    // enforce functionality up front (bounded job: stops at first dup)
    require(e.groupBy(col("src")).count()
        .filter(col("count") > 1).limit(1).count() == 0L,
      "redirect map must be functional: one outgoing edge per source")
    var f = e.withColumn("hops", lit(1L)).localCheckpoint()
    for (_ <- 1 to rounds) {
      val g = f.select(col("src").as("__s2"), col("dst").as("__d2"),
        col("hops").as("__h2"))
      f = f.join(g, f("dst") === g("__s2"), "left")
        .select(col("src"),
          coalesce(col("__d2"), col("dst")).as("dst"),
          (col("hops") + coalesce(col("__h2"), lit(0L))).as("hops"))
        .localCheckpoint()
    }
    val out = e.select(col("src").as("__osrc"))
    f.join(out, f("dst") === col("__osrc"), "left")
      .select(col("src"), col("dst").as("target"), col("hops"),
        col("__osrc").isNull.cast("int").as("terminal"))
  }
}
