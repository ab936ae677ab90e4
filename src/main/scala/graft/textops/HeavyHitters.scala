package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory heavy hitters — the corpus-wide frequent-item table
  * (boilerplate phrases, contamination n-gram lists, hot URLs) computed
  * WITHOUT shuffling the full item-type table.
  *
  * The exact formulation (`q59_top_ngrams`) groupBys every distinct
  * n-gram: correct, map-side-combined, but at 100 TB the shuffle moves
  * the full type table — hundreds of billions of rows for web-scale
  * trigrams — to answer a question whose output is a handful of rows.
  * The classic fix (Misra-Gries 1982; SpaceSaving, Metwally et al.
  * 2005; mergeable summaries, Agarwal et al. PODS 2012) is a two-pass
  * plan whose shuffles are bounded by the sketch capacity, not the type
  * count:
  *
  *  - pass 1 (candidates): each partition keeps a Misra-Gries summary
  *    of at most `capacity` counters. MG guarantees any item with
  *    partition count > n_p/(capacity+1) survives its partition's
  *    summary; since a global count > n/(capacity+1) forces a
  *    partition count > n_p/(capacity+1) in at least one partition (an
  *    averaging argument over Σn_p = n), the UNION of partition
  *    candidates is a superset of every item at support
  *    φ ≥ 1/(capacity+1). Only ≤ capacity rows leave each partition.
  *  - pass 2 (verify): exact counts of the candidate items only — a
  *    semi-join against the (bounded) candidate set, then one
  *    map-side-combined groupBy whose key space is ≤ capacity ×
  *    partitions, then the exact integer support filter.
  *
  * The OUTPUT is therefore EXACT — identical to the full groupBy with
  * `HAVING cnt·10⁶ ≥ n·supportPpm` — and partitioning-invariant (the
  * sketch only ever widens the candidate set; pass 2 restores exact
  * counts), which is what lets the driver gate (`q108_heavy_hitters`)
  * hash-compare it against a plain-SQL oracle. Support is expressed in
  * integer parts-per-million so the threshold comparison
  * `cnt·1_000_000 ≥ n_total·supportPpm` is exact on both engines — no
  * float threshold channel.
  *
  * `mapPartitions` is the sanctioned tool here (genuine per-partition
  * imperative bounded state — the summary is the whole point); the
  * rest of the plan is declarative so Catalyst still prunes/pushes
  * around it.
  */
object HeavyHitters {

  /** Misra-Gries with `capacity` counters over one partition's items.
    * Returns the surviving (item, residual count) pairs — ≤ capacity of
    * them — plus the partition's total item count. Residual counts
    * undercount by at most n_p/(capacity+1); they are used only for
    * candidate selection, never reported.
    */
  private[graft] def misraGries(items: Iterator[String], capacity: Int)
      : (collection.mutable.Map[String, Long], Long) = {
    val counters = collection.mutable.Map.empty[String, Long]
    var total = 0L
    items.foreach { item =>
      total += 1
      mgStep(counters, item, capacity)
    }
    (counters, total)
  }

  /** One Misra-Gries update — shared by the flat and grouped passes. */
  private def mgStep(counters: collection.mutable.Map[String, Long],
      item: String, capacity: Int): Unit =
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None =>
        if (counters.size < capacity) counters.update(item, 1L)
        else {
          // decrement-all step (amortized O(1) per item overall);
          // snapshot the keys — removal during iteration is a
          // structural change mutable.Map does not allow
          val keys = counters.keysIterator.toArray
          var i = 0
          while (i < keys.length) {
            val k = keys(i)
            val c = counters(k)
            if (c == 1L) counters.remove(k) else counters.update(k, c - 1)
            i += 1
          }
        }
    }

  /** Exact heavy hitters of `itemCol` at support `supportPpm` (parts
    * per million of the total item count), computed with per-partition
    * memory and shuffle volume bounded by `capacity` instead of the
    * distinct-item count. Output: (item, cnt, n_total) for every item
    * with cnt·10⁶ ≥ n_total·supportPpm — exactly the full-groupBy
    * answer, in exact integers.
    *
    * `capacity` must be ≥ ⌈10⁶/supportPpm⌉ for the candidate-superset
    * guarantee (support φ = supportPpm/10⁶ ≥ 1/(capacity+1));
    * enforced. The candidate set joins size-conditionally: broadcast
    * while it fits (`broadcastCandidateLimit`), hash-shuffle otherwise
    * — candidates are ≤ capacity × partitions rows, bounded either
    * way.
    */
  def heavyHitters(df: DataFrame, itemCol: String, supportPpm: Long,
      capacity: Int, broadcastCandidateLimit: Long = 1L << 20): DataFrame = {
    require(supportPpm >= 1 && supportPpm <= 1000000L,
      s"supportPpm must be in [1, 1e6], got $supportPpm")
    require(capacity.toLong * supportPpm >= 1000000L,
      s"capacity=$capacity too small for supportPpm=$supportPpm: need " +
        s"capacity >= ceil(1e6/supportPpm) for the candidate-superset guarantee")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
    // pass 1: per-partition MG summaries. Each partition emits its
    // ≤ capacity candidate items (null count slot) and ONE total row
    // (null item slot) — the corpus is read once for both.
    val summarized = items.as[String].mapPartitions { iter =>
      val (counters, total) = misraGries(iter, capacity)
      counters.keysIterator.map(k => (Option(k), 0L)) ++
        Iterator((Option.empty[String], total))
    }.toDF("item", "n")
      // both pass-2 consumers (candidate set + total) read this; cut
      // once so the corpus scan and the MG pass run a single time
      .localCheckpoint(eager = true)
    val nTotal = summarized.filter($"item".isNull)
      .agg(coalesce(sum($"n"), lit(0L))).as[Long].head()
    val candidates = summarized.filter($"item".isNotNull)
      .select($"item").distinct()
    val gated =
      if (candidates.count() <= broadcastCandidateLimit) broadcast(candidates)
      else candidates
    // pass 2: exact counts over candidate items only; integer support
    // filter — identical relation to the oracle's HAVING clause.
    items
      .join(gated, Seq("item"), "left_semi")
      .groupBy($"item")
      .agg(count(lit(1)).as("cnt"))
      // decimal(38,0) compare: cnt·10⁶ overflows BIGINT once the corpus
      // passes ~9·10¹² items — inside 100 TB territory; values are still
      // exact integers, so the oracle's BIGINT compare agrees
      .filter($"cnt".cast("decimal(38,0)") * 1000000L >=
        lit(nTotal).cast("decimal(38,0)") * supportPpm)
      .withColumn("n_total", lit(nTotal))
  }

  /** [[heavyHitters]] per GROUP — the per-domain boilerplate table,
    * per-language stop-list, per-source hot-URL list: every item whose
    * count within its group reaches `supportPpm` of that GROUP's item
    * total. Output `(groupCol, item, cnt, n_total)` — exactly the
    * per-group HAVING answer, in exact integers.
    *
    * Same two-pass discipline, one Misra-Gries summary PER GROUP per
    * partition (the averaging argument applies within each group
    * separately, so the per-group candidate union supersets every item
    * at group support ≥ 1/(capacity+1)). Partition memory is
    * capacity × |groups seen in the partition| counters — groups are
    * control-plane-bounded strata (languages, sources, eTLD+1 tiers),
    * the same assumption every stratified operator here makes. Shuffle
    * stays candidate-bounded: ≤ capacity × groups × partitions
    * candidate rows, one (partition, group) total row each, and the
    * verify groupBy's key space is the candidate set, never the full
    * per-group type table.
    */
  def heavyHittersByGroup(df: DataFrame, groupCol: String, itemCol: String,
      supportPpm: Long, capacity: Int,
      broadcastCandidateLimit: Long = 1L << 20): DataFrame = {
    require(supportPpm >= 1 && supportPpm <= 1000000L,
      s"supportPpm must be in [1, 1e6], got $supportPpm")
    require(capacity.toLong * supportPpm >= 1000000L,
      s"capacity=$capacity too small for supportPpm=$supportPpm: need " +
        s"capacity >= ceil(1e6/supportPpm) for the candidate-superset guarantee")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(groupCol).cast("string").as("grp"),
      col(itemCol).cast("string").as("item"))
    val summarized = items.as[(String, String)].mapPartitions { iter =>
      val counters =
        collection.mutable.Map.empty[String, collection.mutable.Map[String, Long]]
      val totals = collection.mutable.Map.empty[String, Long]
      iter.foreach { case (g, item) =>
        totals.update(g, totals.getOrElse(g, 0L) + 1L)
        mgStep(counters.getOrElseUpdate(g,
          collection.mutable.Map.empty[String, Long]), item, capacity)
      }
      counters.iterator.flatMap { case (g, m) =>
        m.keysIterator.map(k => (g, Option(k), 0L))
      } ++ totals.iterator.map { case (g, t) => (g, Option.empty[String], t) }
    }.toDF("grp", "item", "n")
      .localCheckpoint(eager = true)
    val totals = summarized.filter($"item".isNull)
      .groupBy($"grp").agg(sum($"n").as("n_total"))
    val candidates = summarized.filter($"item".isNotNull)
      .select($"grp", $"item").distinct()
    val gated =
      if (candidates.count() <= broadcastCandidateLimit) broadcast(candidates)
      else candidates
    items
      .join(gated, Seq("grp", "item"), "left_semi")
      .groupBy($"grp", $"item")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), "grp") // |groups| rows — control-plane sized
      .filter($"cnt".cast("decimal(38,0)") * 1000000L >=
        $"n_total".cast("decimal(38,0)") * supportPpm)
      .select($"grp".as(groupCol), $"item", $"cnt", $"n_total")
  }
}
