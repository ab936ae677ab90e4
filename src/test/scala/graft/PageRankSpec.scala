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
