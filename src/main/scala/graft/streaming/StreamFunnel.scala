package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel staging: the `flatMapGroupsWithState` twin of
  * [[graft.temporal.Temporal.funnelStages]].
  *
  * State per key is ONE integer — the length of the completed stage
  * PREFIX — advanced greedily on each qualifying event. Greedy
  * earliest-completion equals the batch windows' deepest chain when a
  * key's events are processed in event-time order: taking the earliest
  * qualifying event for stage i never blocks stage i+1 (any later
  * chain's stage-i event is no earlier, so everything after it remains
  * available — the standard exchange argument), and one event advances
  * at most one stage, matching the batch strictly-before frame.
  *
  * Ordering contract: events are sorted by (ts, id) WITHIN each
  * micro-batch; across batches the fold relies on per-key event-time
  * arrival order. A straggler older than an already-processed
  * later event cannot retroactively deepen a chain — the one
  * divergence from batch, inherent to single-pass state (the batch
  * form remains the backfill truth; this is the live view).
  *
  * Emission: one `(key, funnel_stage)` row whenever a key's depth
  * deepens (Update mode) — per-key emitted depths are strictly
  * increasing while the key's state lives. State is an Int per key;
  * `idleTimeout` is an EVENT-TIME eviction (same
  * `EventTimeTimeout`-from-watermark shape as StreamSessionize): a key
  * with no event for `idleTimeout` of event time past the watermark is
  * dropped. An evicted key that re-enters restarts at depth 0 — the
  * same single-pass caveat as the straggler rule above, so emitted
  * depths can reset across an eviction boundary, never within one
  * lifetime. Pass null to keep state forever.
  */
object StreamFunnel {

  final case class FunnelEvent(key: Long, ts: Timestamp, event_id: Long, event_type: String)
  final case class FunnelUpdate(user_id: Long, funnel_stage: Int)

  /** depth = completed stage prefix; lastMs = the key's latest event
    * time, the idle-eviction anchor (anchoring on the watermark instead
    * would evict a key up to one watermark-advance early).
    */
  final case class FunnelState(depth: Int, lastMs: Long)

  private def microsFromTs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** Per-stage last-completion micros; UnsetMs marks "never". The state
    * the HORIZON variant needs: a depth-only greedy latches onto the
    * FIRST stage-i completion, but a later repeat of stage i can be the
    * one that puts stage i+1 in horizon — tracking the running max
    * completion per stage is exactly the batch form's cumulative-max
    * window, so stream and batch agree under event-time order.
    * `lastSeenMs` is the idle-eviction anchor: the key's latest event
    * of ANY type (a completion-only anchor would evict a key that is
    * active but stalled mid-funnel).
    */
  final case class FunnelWinState(lastMs: Seq[Long], lastSeenMs: Long)
  private val UnsetMs = Long.MinValue

  /** `idleTimeout` interval string → micros, or -1 for null (no
    * eviction). Shared by both funnel variants.
    */
  private def idleTimeoutUs(idleTimeout: String): Long =
    if (idleTimeout == null) -1L
    else {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(idleTimeout))
      require(iv.months == 0, s"idleTimeout must be day-scale or finer: $idleTimeout")
      iv.days * 24L * 3600 * 1000000 + iv.microseconds
    }

  /** Streaming twin of [[graft.temporal.Temporal.funnelStagesWithin]]:
    * stage i+1 counts only within `horizonSec` of the closest stage-i
    * completion. Same arrival-order contract, Update-mode emission, and
    * event-time `idleTimeout` eviction as [[funnelStages]] — without
    * eviction the per-key state (one Long per stage) would grow with
    * key cardinality forever; pass null to keep state for the stream's
    * lifetime.
    */
  def funnelStagesWithin(
      events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, stages: Seq[String], horizonSec: Long,
      watermark: String, idleTimeout: String = null): Dataset[FunnelUpdate] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(horizonSec > 0, s"horizon must be positive: $horizonSec")
    val spark = events.sparkSession
    import spark.implicits._
    // micros end to end: the batch twin compares unix_micros, and a
    // millis truncation here could flip an exactly-at-horizon event
    val horizonUs = horizonSec * 1000000L
    val idleUs = idleTimeoutUs(idleTimeout)
    val timeoutKind =
      if (idleTimeout == null) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.EventTimeTimeout
    val src = events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("event_id"), col(typeCol).as("event_type"))
      .as[FunnelEvent]
    src.groupByKey(_.key)
      .flatMapGroupsWithState[FunnelWinState, FunnelUpdate](
        OutputMode.Update, timeoutKind) {
        (key: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelWinState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
            val last = prev.map(_.lastMs.toArray)
              .getOrElse(Array.fill(stages.length)(UnsetMs))
            var lastSeen = prev.map(_.lastSeenMs).getOrElse(Long.MinValue)
            def depth = last.lastIndexWhere(_ != UnsetMs) + 1
            val before = depth
            rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
              .foreach { e =>
                val i = stages.indexOf(e.event_type)
                val us = microsFromTs(e.ts)
                if (i == 0) last(0) = math.max(last(0), us)
                else if (i > 0 && last(i - 1) != UnsetMs && us - last(i - 1) <= horizonUs)
                  last(i) = math.max(last(i), us)
                lastSeen = math.max(lastSeen, e.ts.getTime)
              }
            val after = depth
            if (last.exists(_ != UnsetMs))
              state.update(FunnelWinState(last.toSeq, lastSeen))
            if (idleUs >= 0 && state.exists)
              // same anchor rule as funnelStages: `idleTimeout` of EVENT
              // time past the key's last event, floored above the
              // current watermark to stay legal
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, lastSeen + idleUs / 1000))
            if (after > before) Iterator(FunnelUpdate(key, after)) else Iterator.empty
          }
      }
  }

  def funnelStages(
      events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, stages: Seq[String], watermark: String,
      idleTimeout: String = null): Dataset[FunnelUpdate] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val src = events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("event_id"), col(typeCol).as("event_type"))
      .as[FunnelEvent]
    val idleUs = idleTimeoutUs(idleTimeout)
    val timeoutKind =
      if (idleTimeout == null) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.EventTimeTimeout
    src.groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](OutputMode.Update, timeoutKind) {
        (key: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            var depth = prev.depth
            var lastMs = prev.lastMs
            rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
              .foreach { e =>
                if (depth < stages.length && e.event_type == stages(depth)) depth += 1
                lastMs = math.max(lastMs, e.ts.getTime)
              }
            val deepened = depth > prev.depth
            if (deepened || (idleUs >= 0 && lastMs > prev.lastMs && state.exists))
              state.update(FunnelState(depth, lastMs))
            if (idleUs >= 0 && state.exists) {
              // evict after `idleTimeout` of EVENT time past the key's
              // LAST event — anchoring on the watermark alone would
              // evict up to one watermark-advance early; the watermark
              // floor keeps the timestamp legal (must exceed it)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, lastMs + idleUs / 1000))
            }
            if (deepened) Iterator(FunnelUpdate(key, depth)) else Iterator.empty
          }
      }
  }
}
