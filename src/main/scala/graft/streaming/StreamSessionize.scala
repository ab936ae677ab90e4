package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization: the `flatMapGroupsWithState`
  * twin of [[graft.temporal.Temporal.sessionizeStream]] (which uses the
  * native `session_window` aggregate). The native form is the right
  * default; this form exists for session semantics the aggregate cannot
  * express — per-session derived fields computed at emission, session
  * caps, custom merge rules — so the engine carries both, pinned to the
  * SAME output for the plain gap rule (spec'd equal to the batch
  * sessionize, including the touching-windows merge: an event exactly
  * `gap` after the previous one still extends the session).
  *
  * State per key is a list of OPEN sessions (out-of-order events inside
  * the watermark can open a session that later merges into another —
  * the list handles it); a session is emitted exactly once, when the
  * watermark strictly passes its end (`last event + gap`), and state is
  * evicted by event-time timeout — bounded by the watermark horizon,
  * the only correct shape for an unbounded feed.
  *
  * Arithmetic mirrors the batch form's float policy AND null
  * semantics: values accumulate as exact cents (`decimal(18,2) · 100`
  * as long), null values contribute nothing, and a session whose
  * values are ALL null emits a NULL sum — exactly
  * `sum(decimal).cast(double)` over that group; otherwise the emitted
  * `sum_value` is one double division.
  */
object StreamSessionize {

  // carries the watermarked timestamp column itself (dropping it for a
  // derived long would strip the event-time watermark from the plan)
  final case class SessEvent(key: Long, ts: Timestamp, cents: Long, has_value: Boolean)

  private def microsFromTs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** An open (not yet emitted) session in state, all times in micros. */
  final case class OpenSession(start_us: Long, last_us: Long, n: Long,
      cents: Long, n_values: Long)

  final case class SessState(open: List[OpenSession])

  /** Matches the batch sessionize output row (column-for-column). */
  final case class SessionRow(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Option[Double])

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000 * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def intervalUs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"interval must be day-scale or finer: $s")
    iv.days * 24L * 3600 * 1000000 + iv.microseconds
  }

  /** Sorted-fold merge of open sessions with the batch touching rule:
    * a session starting at most `gap` after another's last event joins
    * it.
    */
  private def mergeAll(sessions: List[OpenSession], gapUs: Long): List[OpenSession] =
    sessions.sortBy(s => (s.start_us, s.last_us)).foldLeft(List.empty[OpenSession]) {
      case (cur :: rest, next) if next.start_us <= cur.last_us + gapUs =>
        OpenSession(cur.start_us, math.max(cur.last_us, next.last_us),
          cur.n + next.n, cur.cents + next.cents,
          cur.n_values + next.n_values) :: rest
      case (acc, next) => next :: acc
    }.reverse

  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gap: String, watermark: String): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = intervalUs(gap)
    val src = events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"),
        col(tsCol).as("ts"),
        coalesce((col(valueCol).cast("decimal(18,2)") * 100).cast("long"), lit(0L))
          .as("cents"),
        col(valueCol).isNotNull.as("has_value"))
      .as[SessEvent]
    src.groupByKey(_.key)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          val arrived = rows.map { e =>
            val us = microsFromTs(e.ts)
            OpenSession(us, us, 1L, e.cents, if (e.has_value) 1L else 0L)
          }.toList
          val open = mergeAll(
            state.getOption.map(_.open).getOrElse(Nil) ::: arrived, gapUs)
          // close once the watermark STRICTLY passes the session end: an
          // admitted event has ts >= watermark, and ts == end would still
          // be a touching merge, so `end < wm` is the earliest safe point
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val (closed, stillOpen) = open.partition(s => s.last_us + gapUs < wmUs)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(SessState(stillOpen))
            // wake when the earliest open session becomes closable; the
            // +1 keeps it strictly after the current watermark (ends of
            // still-open sessions are >= wm by the partition above)
            state.setTimeoutTimestamp(
              stillOpen.map(s => s.last_us + gapUs).min / 1000 + 1)
          }
          closed.sortBy(_.start_us).iterator.map { s =>
            // all-null values -> NULL sum, matching the batch
            // sum(decimal) over an all-null group
            SessionRow(key, tsFromMicros(s.start_us),
              tsFromMicros(s.last_us + gapUs), s.n,
              if (s.n_values == 0) None else Some(s.cents / 100.0))
          }
      }
  }
}
