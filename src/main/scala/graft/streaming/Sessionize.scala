package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event as seen by the sessionizer: `ms` is epoch millis derived from
  * the long-nanos `ts` (see EventStream.source). */
final case class SessionEvent(user_id: Long, event_id: Long, ms: Long)

/** Open-session state kept per user between micro-batches. */
final case class OpenSession(seq: Long, startMs: Long, lastMs: Long, n: Long)

/** A closed session (same shape as the batch q16_sessionize output). */
final case class ClosedSession(
    user_id: Long, session_id: Long, n_events: Long,
    session_start_ms: Long, session_end_ms: Long)

/** Gap-based streaming sessionization via flatMapGroupsWithState — the
  * continuous twin of the batch window-function sessionizer
  * (SparkEntry q16): same gap rule, same output shape.
  *
  * Per user (group key): events in each micro-batch are folded into the
  * open session; a gap > `gapMs` closes the current session and emits it.
  * An event-time timeout at (last event + gap) closes idle sessions once
  * the watermark passes, bounding state to one OpenSession per active
  * user. Scale: state is shuffled by user key once; per-batch per-user
  * events are sorted in memory (bounded by the micro-batch size).
  */
object Sessionize {

  def apply(events: DataFrame, gapMs: Long, watermark: String = "1 second")
      : Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("event_time", watermark)
      .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"),
        col("event_time"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: close the idle session
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.seq, s.n, s.startMs, s.lastMs))
          } else {
            val sorted = rows.map(r => SessionEvent(r._1, r._2, r._3)).toArray
              .sortBy(e => (e.ms, e.event_id))
            val (closed, open) = foldEvents(userId, state.getOption,
              scala.collection.immutable.ArraySeq.unsafeWrapArray(sorted), gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** One micro-batch of a user's (sorted) events folded into the open
    * session. Exposed for direct unit testing of the cross-batch
    * late-event semantics. */
  private[graft] def foldEvents(
      userId: Long, open0: Option[OpenSession],
      sorted: Seq[SessionEvent], gapMs: Long): (Seq[ClosedSession], Option[OpenSession]) = {
    val closed = Seq.newBuilder[ClosedSession]
    var open = open0
    // a late-straggler session being assembled from THIS batch's events
    // (they arrive sorted, so consecutive in-gap stragglers merge here
    // exactly as the batch sessionizer would merge them)
    var pending: Option[ClosedSession] = None
    def flushPending(): Unit = pending.foreach { p => closed += p; pending = None }
    sorted.foreach { e =>
      open match {
        // within the gap of the open session on EITHER side: a late
        // cross-batch event may precede the session start, in which case
        // it extends the session BACKWARD (lowers startMs) — matching the
        // batch sessionizer, which sees all events in time order
        case Some(s) if e.ms - s.lastMs <= gapMs && e.ms >= s.startMs - gapMs =>
          flushPending()
          open = Some(s.copy(startMs = math.min(s.startMs, e.ms),
            lastMs = math.max(s.lastMs, e.ms), n = s.n + 1))
        // straggler older than the open session by more than the gap: it
        // can never join the open or any future session. Consecutive
        // in-gap stragglers within this batch fold into ONE session;
        // each completed straggler session takes the current seq and the
        // open session renumbers after it (batch would have numbered it
        // earlier — the id ordering for bounded-late data is the
        // documented divergence; stragglers split across DIFFERENT
        // batches do not merge, which the watermark bounds)
        case Some(s) if e.ms < s.startMs - gapMs =>
          pending match {
            case Some(p) if e.ms - p.session_end_ms <= gapMs =>
              pending = Some(p.copy(n_events = p.n_events + 1,
                session_end_ms = math.max(p.session_end_ms, e.ms)))
            case Some(p) =>
              closed += p
              pending = Some(ClosedSession(userId, s.seq, 1, e.ms, e.ms))
              open = Some(s.copy(seq = s.seq + 1))
            case None =>
              pending = Some(ClosedSession(userId, s.seq, 1, e.ms, e.ms))
              open = Some(s.copy(seq = s.seq + 1))
          }
        case Some(s) =>
          flushPending()
          closed += ClosedSession(userId, s.seq, s.n, s.startMs, s.lastMs)
          open = Some(OpenSession(s.seq + 1, e.ms, e.ms, 1))
        case None =>
          open = Some(OpenSession(1, e.ms, e.ms, 1))
      }
    }
    flushPending()
    (closed.result(), open)
  }
}
