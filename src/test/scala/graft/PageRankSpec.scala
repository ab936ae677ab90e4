package graft

import graft.graph.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      nodes: Seq[Long], edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(
        nodes.toDF("node"), "node",
        edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap

  private val Scale = 1000000000000L
  private val Base = 150000000000L // (1 - 0.85) * scale

  test("symmetric 2-cycle is a fixed point; isolated node holds the base rank") {
    // 1<->2 exchange their full rank each round: base + 0.85*scale = scale
    val out = run(Seq(1L, 2L, 3L), Seq((1L, 2L, 1L), (2L, 1L, 1L)), iters = 3)
    assert(out === Map(1L -> Scale, 2L -> Scale, 3L -> Base))
  }

  test("single directed edge: exact integer trajectory over 3 rounds") {
    // r1(1)=base (no in-edges); r2(2)=base + (base*85)//100 and stays
    val out = run(Seq(1L, 2L), Seq((1L, 2L, 1L)), iters = 3)
    assert(out(1L) === Base)
    assert(out(2L) === Base + Base * 85L / 100L) // 277_500_000_000
  }

  test("weights split a node's rank proportionally with floor division") {
    val out = run(Seq(1L, 2L, 3L), Seq((1L, 2L, 3L), (1L, 3L, 1L)), iters = 1)
    assert(out(2L) === Base + (Scale * 3L / 4L) * 85L / 100L)
    assert(out(3L) === Base + (Scale / 4L) * 85L / 100L)
  }

  test("iters = 0 returns the uniform start vector") {
    val out = run(Seq(5L, 6L), Seq((5L, 6L, 2L)), iters = 0)
    assert(out === Map(5L -> Scale, 6L -> Scale))
  }

  private def runRedistributed(
      nodes: Seq[Long], edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(
        nodes.toDF("node"), "node",
        edges.toDF("src", "dst", "w"), "src", "dst", "w", iters,
        redistributeDangling = true)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap

  test("dangling redistribution conserves total mass within the integer-truncation bound") {
    // 1 -> 2 -> 3, node 3 dangling: under the leak variant its whole
    // rank vanishes each round; redistributed, the total must stay at
    // N·scale up to the documented floor-division losses:
    // < E per round (one per edge contribution), < N (dangling share
    // div), < N (damping div per node), deficit geometrically damped.
    val nodes = Seq(1L, 2L, 3L)
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L))
    val (e, nn) = (edges.size.toLong, nodes.size.toLong)
    for (iters <- 1 to 4) {
      val total = runRedistributed(nodes, edges, iters).values.sum
      val bound = iters * (e + 3L * nn)
      assert(math.abs(total - nn * Scale) <= bound,
        s"iters=$iters total=$total expected=${nn * Scale} ± $bound")
    }
  }

  test("the default leak variant loses the dangling mass the redistribution recovers") {
    val nodes = Seq(1L, 2L, 3L)
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L))
    val leaked = run(nodes, edges, iters = 3).values.sum
    // node 3 held ≥ base rank each round and contributed none of it
    // back: the leak is at least one damped base-share
    assert(leaked < 3L * Scale - Base * 85L / 100L)
  }

  test("redistribution on a dangling-free graph matches the leak variant exactly") {
    // no dangling nodes -> dmass = 0 every round -> identical trajectories
    val nodes = Seq(1L, 2L, 3L)
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 1L, 2L))
    assert(runRedistributed(nodes, edges, 3) === run(nodes, edges, 3))
  }

  test("lineage-cut policy never changes values: deep run ≡ shallow policy at iters=10") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 1L), (3L, 4L, 1L))
    def at(interval: Int): Map[Long, Long] =
      PageRank.ranks(nodes.toDF("node"), "node",
          edges.toDF("src", "dst", "w"), "src", "dst", "w", iters = 10,
          checkpointInterval = interval)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap
    // leak path: interval 3 cuts three times, interval 100 never (the
    // single-ref chain is linear, so staying lazy is legal) — identical
    assert(at(3) === at(100))
    // redistributed path cuts EVERY round (double-ref chain would
    // double the plan per round); conservation must hold at depth too
    val total = runRedistributed(nodes, edges, iters = 10).values.sum
    val bound = 10L * (edges.size + 3L * nodes.size)
    assert(math.abs(total - nodes.size * Scale) <= bound)
  }

  test("non-positive edge weights are rejected up front, not folded into wrong ranks") {
    val bad = intercept[IllegalArgumentException] {
      run(Seq(1L, 2L), Seq((1L, 2L, 0L)), iters = 1)
    }
    assert(bad.getMessage.contains("positive"))
    intercept[IllegalArgumentException] {
      run(Seq(1L, 2L), Seq((1L, 2L, -3L)), iters = 1)
    }
  }
}
