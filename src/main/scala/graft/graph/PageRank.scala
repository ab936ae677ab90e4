package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge list, in EXACT integer arithmetic —
  * ranks are carried as fixed-point micro-units (scale 10^12) and every
  * step is integer multiply/divide, so a fixed iteration count yields
  * bit-identical BIGINT ranks on any engine (the cross-engine float
  * policy applied to an iterative algorithm: IEEE sums over a shuffled
  * edge list would differ in the last ulp between engines, integer sums
  * cannot).
  *
  * Semantics per iteration, with damping d = dampNum/dampDen:
  *
  *   contrib(u→v) = (rank(u) * w(u,v)) div totalW(u)
  *   rank'(v)     = (scale * (dampDen − dampNum)) div dampDen
  *                + (Σ contrib(·→v) * dampNum) div dampDen
  *
  * Dangling mass (nodes with no out-edges) leaks rather than being
  * redistributed — the common "PageRank with leak" variant; with a
  * fixed iteration count the result is still a total, deterministic
  * function of the graph.
  *
  * Scale shape: each round is one join (edges ⋈ ranks on src) and one
  * sum-aggregate (on dst) — both shuffle on the node id, so AQE reuses
  * the same hash partitioning round over round, exactly like
  * [[ConnectedComponents]]. The weighted edge list (with its prefused
  * out-weight column) is persisted once and reused every round; the
  * driver holds no data. Overflow headroom: rank(u) ≤ nNodes·scale, so
  * rank·w must stay under 2^63 — for trillion-edge graphs normalize
  * weights (e.g. divide by their GCD or bucket to per-mille shares)
  * before calling, which preserves exactness.
  */
object PageRank {

  /** Ranks after `iters` rounds: output `(node, rank)` — one row per
    * node in `nodes` (isolated nodes receive the base rank). Edge
    * weights must be positive integers.
    */
  def ranks(
      nodes: DataFrame, nodeCol: String,
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping $dampNum/$dampDen not in (0,1)")
    val n = nodes.select(col(nodeCol).as("node"))
    val e = edges.select(
      col(srcCol).as("src"), col(dstCol).as("dst"), col(wCol).cast("long").as("w"))
    // enforce the documented positive-weight precondition up front: a
    // zero/negative weight would make some tw ≤ 0 and the div NULL or
    // sign-corrupted — plausible-looking wrong ranks instead of an
    // error. One bounded extra job (limit 1 stops at the first hit).
    require(e.filter(col("w") <= 0 || col("w").isNull).limit(1).count() == 0L,
      "edge weights must be positive integers")
    val tw = e.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    // read once per round by every iteration's join — persist (same
    // multi-consumer convention as NearDup's shingle relation)
    val ew = e.join(tw, "src").persist()
    val base = (scale * (dampDen - dampNum)) / dampDen
    var r = n.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val sums = ew.join(r, ew("src") === r("node"))
        .select(col("dst"), expr("(rank * w) div tw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = n.join(sums, n("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(coalesce(s, 0L) * $dampNum) div $dampDen")).as("rank"))
    }
    r
  }
}
