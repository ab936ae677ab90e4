package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators: gap-based sessionization and as-of joins.
  *
  * Both are shapes the reference's event pipelines need (activity
  * rollups per user / latest-state-at-time lookups) expressed in the
  * form that scales:
  *  - sessionization uses Spark's native `session_window` aggregate
  *    (the same operator Structured Streaming uses, so the batch and
  *    streaming forms share semantics);
  *  - the as-of join is the union + running-`last` window formulation —
  *    one shuffle by key, linear scan per partition — instead of a
  *    range join, whose candidate explosion is quadratic in events per
  *    key.
  */
object Temporal {

  /** Gap-based sessions per key: events at most `gap` after the previous
    * one chain into the same session — Spark merges TOUCHING session
    * windows, so an event exactly `gap` later still extends the session;
    * only a strictly larger gap splits. `session_end` is last event +
    * `gap` (the `[start, last + gap)` window). Emits per-session
    * start/end, event count, and an exact-decimal value sum.
    */
  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      gap: String): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming twin of [[sessionize]]: the SAME `session_window`
    * aggregate over a watermarked source — semantics shared by
    * construction, which is the point of using Spark's native session
    * operator instead of hand-rolled state. In append mode a session is
    * emitted exactly once, when the watermark passes its end (last
    * event + gap); state per key is bounded by the watermark horizon.
    * Late events inside the watermark re-open/merge sessions before
    * finalization; later ones are dropped by the watermark like every
    * Structured Streaming aggregate.
    */
  def sessionizeStream(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      gap: String, watermark: String): DataFrame =
    sessionize(events.withWatermark(tsCol, watermark), keyCol, tsCol, valueCol, gap)

  /** Bucketed time-proximity join-aggregate: for each left row, how many
    * right rows lie within ±`radiusSec` seconds of it (regardless of
    * key — a global temporal-correlation probe, unlike the per-key
    * [[asofJoin]]), plus the closest such gap in microseconds (null when
    * nothing is near). Left rows with no nearby right rows are kept with
    * a zero count. `(leftIdCols, leftTsCol)` must uniquely identify left
    * rows — the final aggregate groups by them, so colliding rows would
    * silently merge into one output row with combined counts.
    *
    * Scale shape: the naive `abs(l.ts - r.ts) <= r` predicate is a
    * non-equi join — Spark can only plan BroadcastNestedLoopJoin,
    * O(|L|·|R|). Quantizing timestamps into radius-width buckets turns
    * it into an equi join: each left row probes its own bucket and the
    * two adjacent ones (a 3-element explode), every true pair meets in
    * exactly the right row's own bucket (so no pair dedup is needed),
    * and the exact |Δt| predicate prunes the bucket-boundary corners.
    * Shuffle volume is 3·|L| + |R| rows hashed on bucket id; a hot
    * bucket (event burst) is an AQE skew-split, not a plan change.
    */
  def proximityAgg(
      left: DataFrame, right: DataFrame, leftIdCols: Seq[String],
      leftTsCol: String, rightTsCol: String, radiusSec: Long): DataFrame = {
    require(radiusSec > 0, s"radiusSec must be positive, got $radiusSec")
    val radiusUs = radiusSec * 1000000L
    val l = left
      .select(leftIdCols.map(col) :+ col(leftTsCol): _*)
      .withColumn("__lus", unix_micros(col(leftTsCol)))
      .withColumn("__cand",
        explode(array((-1 to 1).map(d => expr(s"__lus div $radiusUs") + d): _*)))
    val r = right
      .select(unix_micros(col(rightTsCol)).as("__rus"))
      .withColumn("__b", expr(s"__rus div $radiusUs"))
    val near = col("__gap") <= radiusUs
    l.join(r, col("__cand") === col("__b"), "left_outer")
      .withColumn("__gap", abs(col("__rus") - col("__lus")))
      .groupBy(leftIdCols.map(col) :+ col(leftTsCol): _*)
      .agg(
        count(when(near, lit(1))).as("n_near"),
        min(when(near, col("__gap"))).as("min_gap_us"))
  }

  /** As-of join: for each left row, the single most recent right row of
    * the same key with `right.ts <= left.ts` (inclusive). Returns the
    * left columns plus `pickCols` from the matched right row (null when
    * no prior right row exists — left-join semantics). Right rows with a
    * null key or null timestamp are dropped up front: a join-key NULL
    * never equals anything (SQL equality-join semantics), so they could
    * never legitimately match — and in the window formulation they WOULD
    * otherwise leak into null-key left partitions.
    *
    * Implementation: tag both sides, union, and take a running
    * `last(..., ignoreNulls)` over a window ordered by (ts, tag, pick)
    * with right rows tagged 0 so a right row at the identical timestamp
    * is visible to the left row (the `<=` tie rule); the pick struct as
    * the final sort key makes the choice among right rows tied on
    * (key, ts) deterministic (the struct-wise largest wins) instead of
    * partition-order-dependent. One hash shuffle on the key, one sort,
    * no join operator at all — the plan a range join can't match at
    * scale.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      pickCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    val picked = struct(pickCols.map { case (c, a) => col(c).as(a) }: _*)
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
      .select(
        Seq(col(keyCol), col(rightTsCol).as("__ts"), lit(0).as("__tag"), picked.as("__pick")) ++
          leftCols.filterNot(c => c == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      Seq(col(keyCol), col(leftTsCol).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(r.schema("__pick").dataType).as("__pick")) ++
        leftCols.filterNot(c => c == keyCol).map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__tag"), col("__pick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__m", last(col("__pick"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    matched.select(
      leftCols.map(col) ++ pickCols.map { case (_, a) => col("__m").getField(a).as(a) }: _*)
  }

  /** Weekly retention cohorts: keys bucketed by first-activity week ×
    * how many are active at each week offset. Both aggregations shuffle
    * on the key (AQE reuses the partitioning); offsets are exact
    * integer day arithmetic on week-truncated dates. Sessions-TZ
    * sensitive via `date_trunc` — run under UTC like every engine
    * entrypoint, or cohort boundaries drift.
    */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val weeks = events.select(
      col(keyCol), date_trunc("week", col(tsCol)).cast("date").as("week"))
    val cohorts = weeks.groupBy(col(keyCol)).agg(min(col("week")).as("cohort_week"))
    weeks.distinct().join(cohorts, keyCol)
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /** [[funnelStages]] with a CONVERSION HORIZON: stage i+1 only counts
    * within `horizonSec` of a completed stage-i chain (the way funnels
    * are actually measured — an unbounded funnel credits a purchase
    * months after the click). The chain flags become chain-completion
    * TIMESTAMPS: each transition keeps the running max of the previous
    * stage's completion times over the strictly-before frame — event
    * time is monotone in that frame, so the max is the closest
    * completion, and "closest within horizon" is exactly "exists
    * within horizon". Same one-shuffle shape as the unbounded form;
    * micros arithmetic is integer-exact on both engines.
    */
  def funnelStagesWithin(
      events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, stages: Seq[String], horizonSec: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(horizonSec > 0, s"horizon must be positive: $horizonSec")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    var df = events.withColumn("__us", unix_micros(col(tsCol)))
    stages.zipWithIndex.foreach { case (st, i) =>
      val chain = s"__chain_$i"
      if (i == 0)
        df = df.withColumn(chain, when(col(typeCol) === st, col("__us")))
      else
        df = df
          .withColumn(s"__p$i", max(col(s"__chain_${i - 1}")).over(wPrev))
          .withColumn(chain,
            when(col(typeCol) === st && col(s"__p$i").isNotNull &&
              col("__us") - col(s"__p$i") <= horizonSec * 1000000L, col("__us")))
    }
    val maxima = stages.indices.map(i =>
      when(max(col(s"__chain_$i")).isNotNull, i + 1).otherwise(0))
    df.groupBy(col(keyCol))
      .agg((if (maxima.length == 1) maxima.head else greatest(maxima: _*)).as("funnel_stage"))
  }

  /** Ordered funnel staging: per key, the farthest prefix of `stages`
    * completed IN event-time order (stage i+1 only counts strictly
    * AFTER a completed stage-i chain; a purchase before any view is not
    * a conversion). Output `(key, funnel_stage)` — 0 = none, i = the
    * 1-based deepest stage reached, for every key in `events`.
    *
    * Shape: one cumulative-max window per stage transition, all over
    * the SAME (key, ts, id) total order — one shuffle + one sort
    * regardless of funnel depth, then a per-key rollup. Never the
    * per-stage self-join of the event log that naive funnel SQL writes
    * (which is quadratic in stages and joins the full log each time).
    * The (ts, id) tiebreak makes staging deterministic under
    * same-timestamp events, so the result is gate-hashable.
    */
  def funnelStages(
      events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    var df = events
    stages.zipWithIndex.foreach { case (st, i) =>
      val chain = s"__chain_$i"
      if (i == 0)
        df = df.withColumn(chain, when(col(typeCol) === st, 1).otherwise(0))
      else
        df = df
          .withColumn(s"__before_$i",
            coalesce(max(col(s"__chain_${i - 1}")).over(wPrev), lit(0)))
          .withColumn(chain,
            when(col(typeCol) === st && col(s"__before_$i") === 1, 1).otherwise(0))
    }
    val maxima = stages.indices.map(i => max(col(s"__chain_$i")) * (i + 1))
    df.groupBy(col(keyCol))
      .agg((if (maxima.length == 1) maxima.head else greatest(maxima: _*)).as("funnel_stage"))
  }

  /** Burst detection over per-type hourly event counts — the crawl/
    * ingest monitoring signal (a scraper going hot, a feed replaying,
    * a bot storm): each hour's count z-scored against the trailing
    * `lookback` hours of the SAME type.
    *
    * Determinism discipline: the rolling window aggregates EXACT
    * integers (count, sum, sum of squares — never a float running
    * aggregate whose summation order could differ between engines);
    * mean/variance/z derive from those integers in one fixed op nest
    * mirrored literal-for-literal by the oracle, z rounds at 6 BEFORE
    * the burst compare. `+1.0` regularizes the variance so a flat
    * history (variance 0) yields a finite z instead of a division by
    * zero. Rows need `n >= 3` trailing hours to score.
    *
    * Scale shape: one map-side-combined count per (type, hour) — the
    * shuffle carries the bounded (types × hours) table — then windows
    * over THAT, never the event log.
    */
  def eventBursts(events: DataFrame, typeCol: String, tsCol: String,
      lookback: Int = 6, zThreshold: Double = 3.0): DataFrame =
    burstsFromHourly(hourlyCounts(events, typeCol, tsCol), lookback, zThreshold)

  /** Phase 1 (shared with the streaming twin): exact per-(type, hour)
    * counts — one map-side-combined aggregate; additive, so a stream
    * ledger maintains it by integer merge.
    */
  private[graft] def hourlyCounts(
      events: DataFrame, typeCol: String, tsCol: String): DataFrame =
    events.groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("c"))

  /** Phase 2 (shared with the streaming twin): the z computation over
    * an `(event_type, hour, c)` table. Accepts un-combined tables
    * (duplicate (type, hour) delta rows from a ledger fold) — counts
    * re-combine in the first aggregation.
    */
  private[graft] def burstsFromHourly(hourlyRaw: DataFrame,
      lookback: Int = 6, zThreshold: Double = 3.0): DataFrame = {
    require(lookback >= 3, s"lookback must be >= 3, got $lookback")
    val hourly = hourlyRaw.groupBy(col("event_type"), col("hour"))
      .agg(sum(col("c")).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-lookback, -1)
    hourly
      .withColumn("n", count(col("c")).over(w))
      .withColumn("s", sum(col("c")).over(w))
      .withColumn("ss", sum(col("c") * col("c")).over(w))
      .filter(col("n") >= 3)
      .withColumn("mean_prev", round(col("s").cast("double") / col("n"), 6))
      .withColumn("z", round(
        (col("c") - col("s").cast("double") / col("n"))
          / sqrt((col("ss").cast("double") - col("s").cast("double") * col("s") / col("n"))
              / (col("n") - 1) + lit(1.0)), 6))
      .withColumn("burst", (col("z") >= zThreshold).cast("int"))
      .select(col("event_type"), col("hour"), col("c"),
        col("mean_prev"), col("z"), col("burst"))
  }
}
