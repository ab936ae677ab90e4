package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q-digest (Shrivastava et al. 2004) — the QUANTILE member of the
  * mergeable-summary family ([[Sketches]]' fourth classic): rank /
  * percentile estimates over a bounded integer universe `[0, 2^L)`
  * without a global sort, with the deterministic structure GK/t-digest
  * lack (their compressions depend on arrival order; q-digest's
  * depends only on the value HISTOGRAM, so shards build identical
  * digests from identical data and the driver gate can hash-compare
  * the digest itself, the [[Sketches]] discipline).
  *
  * Structure: the complete binary tree over the universe in heap
  * numbering (root `1` covers `[0, 2^L)`; node `i` at depth `d` covers
  * a `2^(L-d)`-wide range; leaves `2^L + v`). Build starts from leaf
  * counts and compresses level by level, deepest first: a family
  * (parent `p`, children `2p`, `2p+1`) with total count ≤ `t =
  * ⌊n/k⌋` folds into the parent. Families are disjoint within a
  * level, so the pass order inside a level is immaterial —
  * compression is a pure function of the histogram. Size after
  * compression is O(k·L); rank error ≤ L·n/k (each of the ≤ L
  * ancestors of a value holds ≤ t mass that may sit on either side).
  *
  * Merge law (mergeable summaries): digests over disjoint corpora
  * merge by node-wise count SUM + recompress at the combined
  * threshold. The merged digest is NOT structurally identical to
  * `build` of the combined histogram in general (mass a shard already
  * folded upward stays folded even where the combined build would have
  * kept it deeper) — what merge preserves EXACTLY is total mass, the
  * size bound, and the rank-error envelope, and those are what the
  * spec pins; rank answers of merged vs rebuilt digests agree within
  * L·n/k.
  *
  * Scale shape: the distributed stage is ONE map-side-combined groupBy
  * whose key space is the universe (≤ 2^L, thousands) — never the row
  * count; the compression runs on the collected ≤ 2^L-row histogram
  * (control-plane, the Misra-Gries-candidates / codebook pattern) and
  * emits the digest as a local table.
  */
object QDigest {

  /** Compress a node map (leaf counts on the build path — leaf ids
    * `2^L + v` — or an already-folded map on the merge path) through
    * the level-by-level family fold. Pure, deterministic,
    * histogram-only: families are disjoint within a level, so there is
    * no order dependence to hide.
    */
  def compress(init: Map[Long, Long], logU: Int, k: Int): Map[Long, Long] = {
    require(logU > 0 && logU < 40, s"logU out of range: $logU")
    require(k > 0, s"k must be positive: $k")
    val n = init.valuesIterator.sum
    val t = n / k
    val nodes = collection.mutable.Map[Long, Long](
      init.filter(_._2 > 0).toSeq: _*)
    var d = logU
    while (d >= 1) {
      val lo = 1L << d
      val hi = 1L << (d + 1)
      val parents = nodes.keysIterator
        .filter(id => id >= lo && id < hi).map(_ / 2).toSet
      parents.foreach { p =>
        val pc = nodes.getOrElse(p, 0L)
        val cc = nodes.getOrElse(2 * p, 0L) + nodes.getOrElse(2 * p + 1, 0L)
        if (pc + cc <= t) {
          nodes.remove(2 * p)
          nodes.remove(2 * p + 1)
          nodes(p) = pc + cc
        }
      }
      d -= 1
    }
    nodes.toMap
  }

  /** Node-wise sum + recompress at the combined threshold — the
    * mergeable-summaries fold; counts at interior nodes are
    * already-folded mass the level loop keeps folding upward. See the
    * object scaladoc for what this does and does not preserve.
    */
  def merge(a: Map[Long, Long], b: Map[Long, Long], logU: Int,
      k: Int): Map[Long, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(id => id -> (a.getOrElse(id, 0L) + b.getOrElse(id, 0L))).toMap
    compress(summed, logU, k)
  }

  /** Rank estimate for integer rank `r` in `[1, n]`: walk nodes in
    * (right endpoint asc, left endpoint desc) order — deepest-first at
    * ties, the canonical q-digest traversal — accumulating counts; the
    * answer is the first node whose cumulative mass reaches `r`,
    * reported as its range's INCLUSIVE upper value. All-integer.
    */
  def rankQuery(digest: Map[Long, Long], logU: Int, r: Long): Long = {
    val ordered = digest.toSeq.map { case (id, cnt) =>
      val (lo, hi) = rangeOf(id, logU)
      (hi, lo, cnt)
    }.sortBy { case (hi, lo, _) => (hi, -lo) }
    var acc = 0L
    ordered.foreach { case (hi, _, cnt) =>
      acc += cnt
      if (acc >= r) return hi - 1
    }
    (1L << logU) - 1
  }

  /** Inclusive-exclusive `[lo, hi)` covered by heap node `id`. */
  def rangeOf(id: Long, logU: Int): (Long, Long) = {
    var d = 0
    while ((id >> (d + 1)) >= 1) d += 1
    val width = 1L << (logU - d)
    val lo = (id - (1L << d)) * width
    (lo, lo + width)
  }

  /** The digest of `valueCol` (clamped to `[0, 2^logU)`) as a
    * DataFrame `(id, lo, hi, cnt)` — distributed universe-bounded
    * leaf groupBy, control-plane compression, local-table emission.
    */
  def digestTable(df: DataFrame, valueCol: Column, logU: Int,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val u = 1L << logU
    val leaves = df
      .select(greatest(least(valueCol.cast("long"), lit(u - 1)), lit(0L)).as("v"))
      .groupBy($"v").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (u + r.getLong(0)) -> r.getLong(1)).toMap
    val digest = compress(leaves, logU, k)
    digest.toSeq.map { case (id, cnt) =>
      val (lo, hi) = rangeOf(id, logU)
      (id, lo, hi, cnt)
    }.sortBy(_._1).toDF("id", "lo", "hi", "cnt")
  }

  /** Per-GROUP digests — the panel form (q160: one latency/size
    * digest per HOST): `(group, id, lo, hi, cnt)`, one digest per
    * distinct group value, each compressed by the same [[compress]]
    * at ITS OWN threshold `n_g / k`.
    *
    * Scale shape: this one must NOT collect (hosts are unbounded
    * where the global digest's universe is not) — the distributed
    * stage is a map-side-combined `(group, leaf)` count, then
    * `flatMapGroups` compresses each group's ≤ 2^logU-row histogram
    * where it sits. State per task is one group's histogram — never
    * the corpus, never the host count. A 100 TB crawl log with 10⁸
    * hosts shuffles only its (host, leaf) count table, ≤ 2^logU rows
    * per host.
    */
  def digestByGroup(df: DataFrame, groupCol: Column, valueCol: Column,
      logU: Int, k: Int): DataFrame = {
    require(logU > 0 && logU < 40, s"logU out of range: $logU")
    val spark = df.sparkSession
    import spark.implicits._
    val u = 1L << logU
    val counts = df
      .select(groupCol.cast("string").as("g"),
        greatest(least(valueCol.cast("long"), lit(u - 1)), lit(0L)).as("v"))
      .groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
      .as[(String, Long, Long)]
    digestsFromGroupCounts(counts, logU, k)
  }

  /** Per-group digests from an already-aggregated `(group, clamped
    * leaf value, cnt)` relation — the derivation [[digestByGroup]]
    * and the grouped streaming session share, so streamed ≡ batch is
    * equality of code paths, not a re-implementation.
    */
  def digestsFromGroupCounts(
      counts: org.apache.spark.sql.Dataset[(String, Long, Long)],
      logU: Int, k: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val u = 1L << logU
    val lU = logU
    val kk = k
    counts
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val leaves = it.map { case (_, v, c) => (u + v) -> c }.toMap
        compress(leaves, lU, kk).toSeq
          .map { case (id, cnt) =>
            val (lo, hi) = rangeOf(id, lU)
            (g, id, lo, hi, cnt)
          }.sortBy(_._2)
      }
      .toDF("group", "id", "lo", "hi", "cnt")
  }

  /** Quantile estimates at twentieth ranks (`j/20`, the q106
    * fracTwentieths discipline — integer rank `r = ⌈n·j/20⌉` keeps the
    * gate exact): one row `(twentieths, rank, value)` per requested j.
    */
  def quantilesTable(df: DataFrame, valueCol: Column, logU: Int, k: Int,
      twentieths: Seq[Int]): DataFrame = {
    require(twentieths.nonEmpty && twentieths.forall(j => j >= 1 && j <= 20),
      s"twentieths out of range: $twentieths")
    val spark = df.sparkSession
    import spark.implicits._
    val u = 1L << logU
    val leaves = df
      .select(greatest(least(valueCol.cast("long"), lit(u - 1)), lit(0L)).as("v"))
      .groupBy($"v").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (u + r.getLong(0)) -> r.getLong(1)).toMap
    val n = leaves.valuesIterator.sum
    val digest = compress(leaves, logU, k)
    twentieths.sorted.map { j =>
      val r = (n * j + 19) / 20
      (j, r, rankQuery(digest, logU, r))
    }.toDF("twentieths", "rank", "value")
  }
}
