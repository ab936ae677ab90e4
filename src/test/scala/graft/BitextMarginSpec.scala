package graft

import graft.vectors.Vectors

/** Bitext margin mining: hub suppression (the reason margin exists),
  * winner identities on a hand-built geometry, acceptance flags, and
  * integer determinism under partitioning.
  */
class BitextMarginSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Seq[(Long, Seq[Float])], b: Seq[(Long, Seq[Float])],
      k: Int, thr: Long, parts: Int = 4) =
    Vectors.bitextMarginPairs(
        a.toDF("id", "v").repartition(parts), b.toDF("id", "v").repartition(parts),
        "id", "v", k, thr)
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap

  test("exact matches win their pair; winners are the aligned twins") {
    // side A: unit axes; side B: the same axes (ids 10x) plus a hub
    // vector mid-way between them
    val a = Seq(1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f), 3L -> Seq(0f, 0f, 1f))
    val b = Seq(10L -> Seq(1f, 0f, 0f), 20L -> Seq(0f, 1f, 0f),
      30L -> Seq(0f, 0f, 1f), 99L -> Seq(0.58f, 0.58f, 0.58f))
    val out = run(a, b, k = 2, thr = 1100000L)
    assert(out(1L)._1 == 10L && out(2L)._1 == 20L && out(3L)._1 == 30L,
      s"aligned twins must win: $out")
    assert(out.values.forall(_._3 == 1), "exact matches clear the threshold")
  }

  test("margin suppresses hubs: a near-everything vector loses to a true twin") {
    // x is close to hub h AND closer still to its twin t; raw cosine
    // would rank t first here anyway, so make the hub the top-cosine
    // candidate for x — margin must still prefer the twin because the
    // hub's own neighborhood mean is high (it is everyone's neighbor)
    val a = Seq(
      1L -> Seq(1f, 0.3f, 0f),
      2L -> Seq(0f, 1f, 0.2f),
      3L -> Seq(0.1f, 0f, 1f))
    val hub = 99L -> Seq(0.6f, 0.6f, 0.5f)
    val b = Seq(
      10L -> Seq(1f, 0.25f, 0f), // twin of 1
      20L -> Seq(0f, 1f, 0.25f), // twin of 2
      30L -> Seq(0.15f, 0f, 1f), // twin of 3
      hub)
    val out = run(a, b, k = 2, thr = 1000000L)
    assert(out(1L)._1 == 10L && out(2L)._1 == 20L && out(3L)._1 == 30L,
      s"the hub must not win any pair: $out")
  }

  test("bucketed path: identical vectors share a bucket, so twins still pair; subset of brute") {
    val a = Seq(1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f), 3L -> Seq(0f, 0f, 1f))
    val b = Seq(10L -> Seq(1f, 0f, 0f), 20L -> Seq(0f, 1f, 0f), 30L -> Seq(0f, 0f, 1f))
    val out = Vectors.bitextMarginPairsBucketed(
        a.toDF("id", "v"), b.toDF("id", "v"), "id", "v",
        k = 2, thresholdE6 = 1000000L, planes = 2, dim = 3)
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    // a twin is bit-identical to its partner, so it ALWAYS shares the
    // partner's bucket — every emitted winner must be the twin
    out.foreach { case (s, t) => assert(t == s * 10, s"$s paired $t") }
    // emitted sources are a subset of side A (empty buckets emit none)
    assert(out.keySet.subsetOf(Set(1L, 2L, 3L)))
  }

  test("sparse neighborhoods divide by their own size, not k (threshold comparable across paths)") {
    // single twin pair: with k = 4 but only ONE candidate per side the
    // mean must divide by 1 — sim 2e6, means 2e6 each, margin exactly
    // (2·2e6·1e6) div (2e6 + 2e6) = 1e6. Dividing by k would have
    // quartered the means and inflated the margin to 4e6.
    val a = Seq(1L -> Seq(1f, 0f, 0f))
    val b = Seq(10L -> Seq(1f, 0f, 0f))
    val out = run(a, b, k = 4, thr = 1000000L)
    assert(out(1L) == ((10L, 1000000L, 1)), s"got $out")
  }

  test("deterministic under partitioning; margins are exact integers") {
    val rnd = new scala.util.Random(5)
    def vecs(n: Int, off: Long) = (0 until n).map(i =>
      (off + i, Seq.fill(8)(rnd.nextFloat())))
    val a = vecs(12, 0L)
    val b = vecs(15, 100L)
    val r1 = run(a, b, k = 4, thr = 1020000L, parts = 1)
    val r13 = run(a, b, k = 4, thr = 1020000L, parts = 13)
    assert(r1 == r13)
    assert(r1.size == 12, "one best pair per source vector")
  }
}
