package graft

import graft.graph.Redirects

/** Pointer-doubling redirect resolution: exact endpoints and hop
  * counts within the 2^rounds ceiling, cycle/overlong behavior at it,
  * and the functionality precondition.
  */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  private def resolveMap(edges: Seq[(String, String)], rounds: Int) =
    Redirects.resolve(edges.toDF("src", "dst"), "src", "dst", rounds)
      .as[(String, String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("chains within the ceiling resolve to the endpoint with exact hops") {
    // a→b→c→d (3 hops), plus a detached 1-hop x→y
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "x" -> "y")
    val out = resolveMap(edges, 2) // ceiling 4
    assert(out("a") == (("d", 3L, 1)))
    assert(out("b") == (("d", 2L, 1)))
    assert(out("c") == (("d", 1L, 1)))
    assert(out("x") == (("y", 1L, 1)))
  }

  test("a chain longer than 2^rounds reports non-terminal at exactly 2^rounds hops") {
    val edges = (0 until 10).map(i => s"n$i" -> s"n${i + 1}")
    val out = resolveMap(edges, 2) // ceiling 4 < 10
    assert(out("n0") == (("n4", 4L, 0)), "stopped mid-chain, not terminal")
    assert(out("n6") == (("n10", 4L, 1)), "n10 has no outgoing edge")
    // one more round resolves everything (ceiling 8 < 10 still cuts n0)
    val out3 = resolveMap(edges, 3)
    assert(out3("n0") == (("n8", 8L, 0)))
    assert(out3("n2") == (("n10", 8L, 1)))
  }

  test("cycles never terminate: deterministic landing, terminal = 0") {
    val edges = Seq("a" -> "b", "b" -> "a", "in" -> "a")
    val out = resolveMap(edges, 3)
    // f_k(a) alternates a/b by parity of 2^k; hops = 2^rounds exactly
    assert(out("a")._2 == 8L && out("a")._3 == 0)
    assert(out("b")._2 == 8L && out("b")._3 == 0)
    assert(out("in")._3 == 0, "a chain INTO a cycle is also non-terminal")
  }

  test("rounds = 0 is the raw edge list with terminal classification") {
    val out = resolveMap(Seq("a" -> "b", "b" -> "c"), 0)
    assert(out("a") == (("b", 1L, 0)))
    assert(out("b") == (("c", 1L, 1)))
  }

  test("non-functional input (two edges from one source) is rejected") {
    val ex = intercept[IllegalArgumentException] {
      Redirects.resolve(Seq("a" -> "b", "a" -> "c").toDF("src", "dst"),
        "src", "dst", 2).collect()
    }
    assert(ex.getMessage.contains("functional"))
  }

  test("self-loop: lands on itself, non-terminal") {
    val out = resolveMap(Seq("s" -> "s"), 2)
    assert(out("s") == (("s", 4L, 0)))
  }
}
