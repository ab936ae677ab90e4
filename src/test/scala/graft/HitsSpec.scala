package graft

import graft.graph.Hits

/** HITS in exact integer fixed point: hub/authority separation on the
  * canonical bipartite shape, MAX-normalization law, determinism
  * under partitioning, and the precondition.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 100000L

  private def run(nodes: Seq[String], edges: Seq[(String, String, Long)],
      iters: Int, parts: Int = 4) = {
    val n = nodes.toDF("node").repartition(parts)
    val e = edges.toDF("src", "dst", "w").repartition(parts)
    Hits.scores(n, "node", e, "src", "dst", "w", iters, Scale)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("bipartite: sources are pure hubs, sinks pure authorities; leaders pin at scale") {
    // s1 points at both sinks (strong hub), s2 at one; t1 receives
    // more weighted mass than t2
    val nodes = Seq("s1", "s2", "t1", "t2")
    val edges = Seq(("s1", "t1", 3L), ("s1", "t2", 1L), ("s2", "t1", 1L))
    val out = run(nodes, edges, iters = 2)
    assert(out("t1")._1 == 0L && out("t2")._1 == 0L, "sinks have hub 0")
    assert(out("s1")._2 == 0L && out("s2")._2 == 0L, "sources have auth 0")
    assert(out("t1")._2 == Scale, "strongest authority pins at scale")
    assert(out("s1")._1 == Scale, "strongest hub pins at scale")
    assert(out("t2")._2 > 0L && out("t2")._2 < Scale)
    assert(out("s2")._1 > 0L && out("s2")._1 < Scale)
  }

  test("round 1 hand-check on the bipartite example") {
    val nodes = Seq("s1", "s2", "t1", "t2")
    val edges = Seq(("s1", "t1", 3L), ("s1", "t2", 1L), ("s2", "t1", 1L))
    val out = run(nodes, edges, iters = 1)
    // a1 raw: t1 = 4·Scale, t2 = 1·Scale -> a(t1)=Scale, a(t2)=Scale/4
    assert(out("t1")._2 == Scale && out("t2")._2 == 25000L)
    // h1 raw: s1 = 3·Scale + 1·25000, s2 = 1·Scale -> max = s1
    val s1raw = 3 * Scale + 25000L
    assert(out("s1")._1 == Scale)
    assert(out("s2")._1 == (Scale * Scale) / s1raw)
  }

  test("deterministic under partitioning; isolated nodes score (0, 0)") {
    val nodes = Seq("a", "b", "c", "lonely")
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L))
    val r1 = run(nodes, edges, 3, parts = 1)
    val r13 = run(nodes, edges, 3, parts = 13)
    assert(r1 == r13)
    assert(r1("lonely") == ((0L, 0L)))
  }

  test("non-positive weights are rejected") {
    val ex = intercept[IllegalArgumentException] {
      run(Seq("a", "b"), Seq(("a", "b", 0L)), 1)
    }
    assert(ex.getMessage.contains("positive"))
  }

  test("edge endpoints absent from the node set are rejected") {
    // coverage enforcement rides the FIRST half-step + rescale pair
    // only (src via the half-step's left join, dst via the first
    // rescale's full-outer node join — raise_error on the unmatched
    // side, zero probe jobs), so it surfaces through Spark's
    // task-failure chain when the first rescale's localCheckpoint
    // executes — still eagerly, inside the scores() call itself
    def chain(t: Throwable): String = {
      var m = ""
      var c: Throwable = t
      while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
      m
    }
    val ex = intercept[Exception] {
      run(Seq("a", "b"), Seq(("a", "b", 1L), ("a", "ghost", 1L)), 1)
    }
    assert(chain(ex).contains("endpoint"))
    // missing SRC endpoint trips the other half-step's check
    val ex2 = intercept[Exception] {
      run(Seq("a", "b"), Seq(("a", "b", 1L), ("ghost", "b", 1L)), 1)
    }
    assert(chain(ex2).contains("endpoint"))
  }

  test("scale^2 * total weight overflow is rejected up front") {
    val n = Seq("a", "b").toDF("node")
    val e = Seq(("a", "b", Long.MaxValue / 4)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException] {
      Hits.scores(n, "node", e, "src", "dst", "w", 1, scale = 100000L)
    }
    assert(ex.getMessage.contains("overflow"))
  }
}
