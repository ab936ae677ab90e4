package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.vectors.Vectors.semanticDedup]] —
  * continuous SemDeDup for an embedding stream against a FIXED
  * broadcast codebook (the production shape: the codebook is a
  * kmeans‖ fit over a reference corpus, refreshed out-of-band; a
  * codebook that moved per-batch would make "duplicate" unstable).
  *
  * An arriving vector is assigned to its max-cosine centroid with the
  * batch operator's exact argmax (round-6 cosine, ties toward the
  * FIRST centroid in the codebook's natural id order) and becomes the
  * `flatMapGroupsWithState` key's responsibility: per cell, state
  * holds the recently seen members — duplicates INCLUDED, because the
  * batch predicate compares against every earlier sweep item, not
  * only keeps (A kept, B duplicate-of-A, C within threshold of B but
  * not of A: C is still a duplicate) — and the vector is a DUPLICATE
  * iff some earlier member is within `threshold` round-6 cosine.
  *
  * Ordering semantics: the batch sweep visits a cell in
  * (centroid_sim ASC, id ASC) order; a stream must visit in ARRIVAL
  * order (first-arrival-wins greedy). Rows inside one micro-batch are
  * processed in (event_ts, id) order, so the stream is a total
  * deterministic function of (rows, micro-batch split) — and when the
  * arrival order IS the batch sweep order the two operators emit
  * identical verdicts (spec-pinned). Under arbitrary arrival the keep
  * set still satisfies the sweep invariants: kept members of a cell
  * are pairwise below threshold, and every drop has an earlier kept
  * neighbor within threshold (spec-pinned).
  *
  * State is bounded two ways (the [[StreamDedup.nearDupStream]]
  * contract): event-time timeout evicts cells idle past `horizon`
  * (re-opening dedup across the horizon, like
  * `dropDuplicatesWithinWatermark`), and `maxPerCell` caps a
  * pathological cell — beyond the cap, arriving vectors still get
  * verdicts but stop enrolling as comparison targets, trading recall
  * against later duplicates for bounded memory (the oversized-cell
  * analogue of the batch operator's `maxCellSize` sub-cell split).
  * Scale shape: the stream shuffles ONCE on the cell id; the codebook
  * probe is a per-row broadcast loop; state per cell is the recent
  * member list within the horizon.
  */
object StreamSemanticDedup {

  final case class SemRow(id: String, cell: String, csim: Double,
      v: Seq[Double], event_ts: java.sql.Timestamp)

  final case class SemVerdict(id: String, cell: String,
      centroid_sim: Double, keep: Int)

  private[streaming] final case class CellState(maxEventMs: Long,
      seen: List[(String, Seq[Double], Double)])

  /** Spark's `round(c, 6)` (HALF_UP on the decimal value) on the
    * driver/executor side — bit-identical to the batch operator's
    * rounding of the same double.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def norm(a: Seq[Double]): Double = math.sqrt(dot(a, a))

  /** Streaming SemDeDup. `stream` must carry `idCol`, `vecCol`
    * (numeric array) and an event-time `tsCol`; `centroids` is the
    * static codebook frame (any orderable id type — ids are ranked in
    * natural ascending order for the tiebreak, numerically when
    * numeric, and emitted as strings).
    */
  def semanticDedupStream(stream: DataFrame, idCol: String, vecCol: String,
      tsCol: String, centroids: DataFrame, cidCol: String, cvecCol: String,
      threshold: Double, horizon: String = "1 hour",
      maxPerCell: Int = 4096): Dataset[SemVerdict] = {
    require(maxPerCell >= 1, s"maxPerCell must be positive: $maxPerCell")
    val spark = stream.sparkSession
    import spark.implicits._
    val numericCid = centroids.schema(cidCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // codebook is control-plane sized (the batch broadcast contract) —
    // collect once, rank in the batch tiebreak order
    val codeRows = centroids
      .select(col(cidCol).cast("string").as("cid"),
        col(cvecCol).cast("array<double>").as("cv"))
      .as[(String, Seq[Double])].collect()
    val code = (if (numericCid) codeRows.sortBy(_._1.toDouble)
      else codeRows.sortBy(_._1))
      .map { case (cid, cv) => (cid, cv, norm(cv)) }
    require(code.nonEmpty, "empty codebook")
    val codeB = spark.sparkContext.broadcast(code)
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(iv.months == 0, s"horizon must be day-scale or finer: $horizon")
    val horizonMs = iv.days * 24L * 3600 * 1000 + iv.microseconds / 1000
    val assign = udf { (v: Seq[Double]) =>
      val cs = codeB.value
      val n = norm(v)
      var bestCell = cs(0)._1
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val s = round6(dot(v, cs(i)._2) / (n * cs(i)._3))
        // strict > : earlier (smaller-ranked) centroid wins ties, the
        // batch max_by((csim, cord)) tiebreak
        if (s > bestSim) { bestSim = s; bestCell = cs(i)._1 }
        i += 1
      }
      (bestCell, bestSim)
    }
    val rows = stream
      .withWatermark(tsCol, horizon)
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).cast("string").as("id"),
        col(vecCol).cast("array<double>").as("v"),
        col(tsCol).as("event_ts"))
      .withColumn("__a", assign(col("v")))
      .select($"id", $"__a._1".as("cell"), $"__a._2".as("csim"),
        $"v", $"event_ts")
      .as[SemRow]
    rows
      .groupByKey(_.cell)
      .flatMapGroupsWithState[CellState, SemVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (cell: String, it: Iterator[SemRow], state: GroupState[CellState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(CellState(Long.MinValue, Nil))
            val out = scala.collection.mutable.ArrayBuffer.empty[SemVerdict]
            // deterministic within-batch order (the iterator's is not)
            it.toSeq.sortBy(r => (r.event_ts.getTime, r.id)).foreach { r =>
              val maxMs = math.max(st.maxEventMs, r.event_ts.getTime)
              val rn = norm(r.v)
              val dup = st.seen.exists { case (_, kv, kn) =>
                round6(dot(r.v, kv) / (rn * kn)) >= threshold
              }
              // duplicates enroll too — the batch predicate compares
              // against every earlier member, not only keeps
              val seen =
                if (st.seen.size < maxPerCell) (r.id, r.v, rn) :: st.seen
                else st.seen
              st = CellState(maxMs, seen)
              out += SemVerdict(r.id, cell, r.csim, if (dup) 0 else 1)
            }
            state.update(st)
            // the nearDupStream eviction contract: horizon past the
            // cell's newest-EVER event
            state.setTimeoutTimestamp(st.maxEventMs + horizonMs)
            out.iterator
          }
      }
  }
}
