package graft

import org.apache.spark.sql.functions._

import graft.sketch.QDigest

/** q-digest laws: mass preservation, the size bound, the family
  * invariant, rank monotonicity, the rank-error envelope, the merge
  * fold, and build determinism under repartitioning.
  */
class QDigestSpec extends SparkSpec {
  import spark.implicits._

  private val LogU = 10
  private val U = 1L << LogU
  private val K = 16

  private def zipfValues(seed: Int, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val r = rnd.nextDouble()
      math.min(U - 1, math.floor(math.pow(r, -0.7)).toLong - 1)
    }
  }

  private def leaves(vs: Seq[Long]): Map[Long, Long] =
    vs.groupBy(identity).map { case (v, g) => (U + v) -> g.size.toLong }

  test("compress: mass preserved, size bounded, family invariant holds") {
    val vs = zipfValues(5, 4000)
    val d = QDigest.compress(leaves(vs), LogU, K)
    assert(d.valuesIterator.sum == vs.size.toLong, "total mass preserved")
    assert(d.size <= 3 * K + 1, s"size ${d.size} exceeds the 3k bound")
    val n = vs.size.toLong
    val t = n / K
    // surviving non-root family mass must exceed t (else it would have folded)
    d.keys.filter(_ > 1).groupBy(_ / 2).foreach { case (p, kids) =>
      val fam = d.getOrElse(p, 0L) +
        d.getOrElse(2 * p, 0L) + d.getOrElse(2 * p + 1, 0L)
      if (kids.exists(k => k == 2 * p || k == 2 * p + 1))
        assert(fam > t, s"family of $p has mass $fam <= t=$t but kept children")
    }
  }

  test("rankQuery: monotone, upper-covering, inside the L*n/k envelope") {
    val vs = zipfValues(9, 3000).sorted
    val n = vs.size.toLong
    val t = n / K
    val d = QDigest.compress(leaves(vs), LogU, K)
    val ranks = Seq(1L, n / 10, n / 4, n / 2, 3 * n / 4, n).filter(_ >= 1)
    val ests = ranks.map(r => r -> QDigest.rankQuery(d, LogU, r))
    ests.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(a <= b) }
    ests.foreach { case (r, est) =>
      val covered = vs.count(_ <= est).toLong
      assert(covered >= r, s"rank $r: est $est covers only $covered")
      // RANK-error envelope (the q-digest guarantee — value-based
      // bounds are meaningless on sparse/discrete data): values
      // strictly below the answer = walk mass before the answer
      // (< r) + the ≤ L straddling ancestors, each ≤ t by the
      // interior-count property
      val below = vs.count(_ < est).toLong
      assert(below <= r - 1 + LogU * t,
        s"rank $r: est $est has $below below (> ${r - 1 + LogU * t})")
    }
  }

  test("merge: mass additive, size bound holds, answers stay in the envelope") {
    val a = zipfValues(11, 2000)
    val b = zipfValues(23, 1500)
    val da = QDigest.compress(leaves(a), LogU, K)
    val db = QDigest.compress(leaves(b), LogU, K)
    val m = QDigest.merge(da, db, LogU, K)
    val all = (a ++ b).sorted
    val n = all.size.toLong
    assert(m.valuesIterator.sum == n)
    assert(m.size <= 3 * K + 1)
    val t = n / K
    Seq(n / 4, n / 2, 3 * n / 4).foreach { r =>
      val est = QDigest.rankQuery(m, LogU, r)
      assert(all.count(_ <= est) >= r)
      // merged digests carry each shard's own folding — the rank
      // envelope doubles (each shard folded at its own ≤ t threshold)
      assert(all.count(_ < est).toLong <= r - 1 + 2 * LogU * t)
    }
  }

  test("digestTable: identical under 1/4/13-partition inputs; clamping applies") {
    val vs = zipfValues(31, 1000) :+ (U + 500L) :+ -7L // out-of-universe rows clamp
    def table(parts: Int) =
      QDigest.digestTable(
          vs.toDF("v").repartition(parts), col("v"), LogU, K)
        .orderBy($"id").collect().toSeq
    val one = table(1)
    assert(table(4) === one)
    assert(table(13) === one)
    val total = one.map(_.getLong(3)).sum
    assert(total == vs.size.toLong, "clamped rows still counted")
  }

  test("quantilesTable: integer twentieth ranks, ends exact on tiny data") {
    // 20 copies of each value 0..9 -> every twentieth rank is exact
    val vs = (0 until 10).flatMap(v => Seq.fill(20)(v.toLong))
    val out = QDigest.quantilesTable(vs.toDF("v"), col("v"), LogU, 1000,
        Seq(1, 10, 20))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // k=1000 -> t=0 -> digest = exact leaves -> answers are exact values
    assert(out.toSeq == Seq((1, 10L, 0L), (10, 100L, 4L), (20, 200L, 9L)))
  }
}
