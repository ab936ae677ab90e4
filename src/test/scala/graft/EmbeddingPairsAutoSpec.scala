package graft

import org.apache.spark.sql.functions._

import graft.textops.NearDup
import graft.vectors.Vectors

/** Scale contract for the data-dependent embedding near-dup bucketing:
  * the plane count must GROW with the corpus (a fixed plane count fixes
  * the bucket count forever, making within-bucket pair work quadratic
  * in N), and the candidate-pair budget must stay linear in N.
  */
class EmbeddingPairsAutoSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16

  private def syntheticVecs(n: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(Dim)(rnd.nextGaussian())))
  }

  test("autoPlanes is the integer-exact ceil(log2(N/target)), clamped") {
    // target 128: exact powers of two must round the integer way
    assert(NearDup.autoPlanes(1L) === NearDup.EmbedMinPlanes)
    assert(NearDup.autoPlanes(128L) === NearDup.EmbedMinPlanes) // q=0 -> 1, clamped to 2
    assert(NearDup.autoPlanes(129L) === NearDup.EmbedMinPlanes) // ceil(log2(~1)) = 1, clamped
    assert(NearDup.autoPlanes(2000L) === 4) // ceil(log2(15.6)) = 4
    assert(NearDup.autoPlanes(2048L) === 4) // exactly 16 buckets needed
    assert(NearDup.autoPlanes(2049L) === 5) // one past the boundary
    assert(NearDup.autoPlanes(20000L) === 8)
    assert(NearDup.autoPlanes(Long.MaxValue) === NearDup.EmbedMaxPlanes)
  }

  test("bucket count grows with N: occupancy and candidate pairs stay bounded at 10x") {
    val target = NearDup.EmbedTargetBucket
    for (n <- Seq(1000, 10000)) {
      val planes = NearDup.autoPlanes(n.toLong)
      val df = syntheticVecs(n, seed = 7).toDF("id", "v")
      val sizes = df
        .select(Vectors.hyperplaneBucket($"v", planes, Dim).as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("sz"))
        .select($"sz").as[Long].collect()
      assert(sizes.sum === n.toLong)
      // mean occupancy ≤ target by construction (2^planes ≥ N/target)
      assert(sizes.sum.toDouble / (1L << planes) <= target.toDouble)
      // candidate-pair budget: Σ sz·(sz−1)/2 must stay LINEAR in N —
      // a fixed 16-bucket scheme would give ~N²/32 pairs (3.1M at
      // n=10k); the budget asserts an order of magnitude under that
      val pairs = sizes.map(s => s * (s - 1) / 2).sum
      assert(pairs <= 2L * n * target,
        s"n=$n planes=$planes candidate pairs $pairs exceed budget ${2L * n * target}")
    }
    // the 10x corpus must use strictly more planes (more buckets)
    assert(NearDup.autoPlanes(10000L) > NearDup.autoPlanes(1000L))
  }

  test("auto pairs ⊇ single-table fixed pairs at the same plane count; all verified") {
    val n = 600
    val df = syntheticVecs(n, seed = 11).toDF("id", "v")
    val planes = NearDup.autoPlanes(n.toLong)
    val threshold = 0.35 // near-orthogonal gaussians: sparse but non-empty
    val fixed = NearDup.embeddingPairs(df, "id", "v", planes, threshold, Dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val auto = NearDup.embeddingPairsAuto(df, "id", "v", threshold, Dim)
      .select($"id_a", $"id_b", $"cosine").as[(Long, Long, Double)].collect()
    // table 0 of the auto variant IS the fixed single table (same seed),
    // so its pairs can only be added to by table 1
    assert(fixed.subsetOf(auto.map(p => (p._1, p._2)).toSet))
    // the exact-verify stage really filters: every reported cosine
    // clears the threshold and matches a direct recomputation
    val byId = syntheticVecs(n, seed = 11).toMap
    auto.foreach { case (a, b, c) =>
      assert(c >= threshold)
      val (va, vb) = (byId(a), byId(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val exact = dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(exact - c) < 1e-6)
    }
  }

  test("an exact duplicate pair is found in EVERY table, at any corpus size") {
    // identical vectors share every hyperplane sign, so no table can
    // split them — recall 1.0 for true duplicates by construction
    val base = syntheticVecs(2000, seed = 23)
    val withDup = base :+ (99999L, base.head._2.clone())
    val pairs = NearDup.embeddingPairsAuto(
        withDup.toDF("id", "v"), "id", "v", threshold = 0.999, Dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((base.head._1, 99999L)))
  }
}
