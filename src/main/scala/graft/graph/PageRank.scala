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
  *                + ((Σ contrib(·→v) [+ dangling share]) * dampNum) div dampDen
  *
  * Dangling mass (nodes with no out-edges): by default it LEAKS — the
  * common "PageRank with leak" variant, kept as the q57 gate contract.
  * With `redistributeDangling = true` each round adds the equal share
  * `danglingMass div nNodes` to every node before damping (the standard
  * Brin–Page formulation), which conserves total mass up to integer
  * truncation: each edge contribution loses < 1 micro-unit to `div`,
  * the share loses < nNodes per round — bounded and spec-pinned
  * (`PageRankSpec`), never a float drift. Either way a fixed iteration
  * count is a total, deterministic function of the graph.
  *
  * Scale shape: each round is one join (edges ⋈ ranks on src) and one
  * sum-aggregate (on dst) — both shuffle on the node id, so AQE reuses
  * the same hash partitioning round over round, exactly like
  * [[ConnectedComponents]]. Lineage handling is depth-aware: past
  * `checkpointInterval` rounds the weighted edge list is cut once with
  * an eager localCheckpoint and the rank frame every interval —
  * without the cut the plan nests `iters` joins deep and
  * analysis/optimization cost blows up at real PageRank depths (20–50
  * rounds); checkpoint blocks are ContextCleaner-reclaimable, unlike a
  * persist() with no unpersist handle (the ConnectedComponents/
  * knnGraph/Triangles convention). At-or-under the interval the LEAK
  * path stays fully LAZY — shallow runs keep their callers' plan shape
  * visible (q57's broadcast-join contract), and ReusedExchange /
  * ReusedBroadcast dedupe the per-round re-reads of the edge subtree
  * within the one action. The REDISTRIBUTED path cuts every round
  * regardless: it reads the rank frame twice per round (contribution
  * join + dangling-mass aggregate), so a lazy chain would double the
  * plan per round — 2^iters subtrees. The dangling share is a 1-row aggregate
  * cross-joined back (broadcast) — no driver-side collect in the loop.
  * Overflow headroom: rank(u) ≤ nNodes·scale, so rank·w must stay
  * under 2^63 — for trillion-edge graphs normalize weights (e.g.
  * divide by their GCD or bucket to per-mille shares) before calling,
  * which preserves exactness.
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
      dampNum: Long = 85, dampDen: Long = 100,
      redistributeDangling: Boolean = false,
      checkpointInterval: Int = 8): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping $dampNum/$dampDen not in (0,1)")
    require(checkpointInterval > 0, s"checkpointInterval must be positive: $checkpointInterval")
    // The deep paths below cut lineage eagerly (per round when
    // redistributing, per interval otherwise), and EVERY cut's rank
    // join re-reads the node frame — left lazy, each cut re-executes
    // the caller's node-derivation subtree from the source (q165: the
    // full outlink extraction, once per round; at corpus scale, one
    // redundant full scan per cut). Materialize the node frame once on
    // those paths. The shallow leak path stays fully lazy — one action,
    // ReusedExchange dedupes the per-round node reads, and callers'
    // plan shapes (q57's broadcast-join contract) remain visible.
    val deep = redistributeDangling || iters > checkpointInterval
    val n0 = nodes.select(col(nodeCol).as("node"))
    val n = if (deep) n0.localCheckpoint() else n0
    val e = edges.select(
      col(srcCol).as("src"), col(dstCol).as("dst"), col(wCol).cast("long").as("w"))
    // enforce the documented positive-weight precondition up front: a
    // zero/negative weight would make some tw ≤ 0 and the div NULL or
    // sign-corrupted — plausible-looking wrong ranks instead of an
    // error. One bounded extra job (limit 1 stops at the first hit).
    require(e.filter(col("w") <= 0 || col("w").isNull).limit(1).count() == 0L,
      "edge weights must be positive integers")
    // The redistributed path reads the rank frame TWICE per round (the
    // contribution join and the dangling-mass aggregate) — left lazy,
    // the plan would DOUBLE per round (2^iters subtrees), so it always
    // cuts per round; the leak path references r once per round (linear
    // plan depth) and cuts only past checkpointInterval.
    val tw = e.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    // the per-round contribution join re-reads the weighted edge frame
    // EVERY round; left lazy, each round re-derives it from the source
    // joins — exchange reuse does NOT fire across rounds (verified:
    // zero ReusedExchange in the executed plan, with the q57
    // extraction's 4-table join re-executing per iteration) — so the
    // edge frame always materializes once, eagerly
    val ew = e.join(tw, "src").localCheckpoint()
    // nodes with no out-edges, whose rank mass would otherwise vanish;
    // materialized once — every round re-reads it
    val dangling =
      if (redistributeDangling)
        n.join(ew.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
          .localCheckpoint()
      else null
    // bounded driver scalar (like knnGraph's plane constants): the
    // equal-share divisor for the dangling mass
    val nNodes = if (redistributeDangling) math.max(1L, n.count()) else 1L
    val base = (scale * (dampDen - dampNum)) / dampDen
    var r = n.withColumn("rank", lit(scale))
    var round = 0
    for (_ <- 1 to iters) {
      val sums = ew.join(r, ew("src") === r("node"))
        .select(col("dst"), expr("(rank * w) div tw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next =
        if (redistributeDangling) {
          val dmass = r.join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
          n.join(sums, n("node") === sums("dst"), "left")
            .join(broadcast(dmass))
            .select(col("node"),
              (lit(base) + expr(
                s"((coalesce(s, 0L) + dmass div $nNodes) * $dampNum) div $dampDen")).as("rank"))
        } else {
          n.join(sums, n("node") === sums("dst"), "left")
            .select(col("node"),
              (lit(base) + expr(s"(coalesce(s, 0L) * $dampNum) div $dampDen")).as("rank"))
        }
      round += 1
      r =
        if (redistributeDangling) next.localCheckpoint() // double-ref: cut every round
        else if (deep && round % checkpointInterval == 0) next.localCheckpoint()
        else next
    }
    r
  }
}
