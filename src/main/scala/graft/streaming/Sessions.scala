package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** User-session assembly over the events stream — the W-surface operator
  * family the reference cannot express (its ordering-key handling,
  * resubmitter_job.go:387-455, preserves order but never *groups* by
  * activity gaps; sessionization is the training-data analog: group a
  * user's events into bursts separated by ≥ gap of inactivity).
  *
  * Two implementations of the same contract:
  *
  *   - [[sessionize]] — the declarative form: `session_window` groupBy.
  *     Works identically on batch frames and streams (with a watermark);
  *     Catalyst owns the merge logic. This is the default.
  *   - [[sessionizeState]] / [[sessionizeStream]] — the custom-state form
  *     (`flatMapGroupsWithState`), for session semantics the built-in
  *     cannot express (per-session running aggregates, early emission,
  *     conditional gaps). State per key is ONE open session (O(1)); a
  *     closed session emits as soon as its successor event arrives or the
  *     event-time watermark passes its end.
  *
  * Session semantics (both forms): an event extends the open session when
  * ts − last_ts < gap; at ts − last_ts ≥ gap it starts a new one.
  * session_end = last event + gap (matching `session_window`'s
  * half-open [start, last+gap) window).
  *
  * Scale: one shuffle on user_id either way. The stateful form's state is
  * constant-size per key; the declarative form's merge is Spark's own
  * incremental session aggregation — both survive 1000 executors. Skewed
  * keys (one user = one partition's worth of events) are the classic
  * hazard; the state fold is streaming-constant-memory, and the batch
  * fold sorts one user's events in one task (documented limit).
  */
object Sessions {

  /** Declarative sessionization: per-user session windows with the given
    * inactivity gap, event count and DECIMAL-deterministic value total.
    */
  def sessionize(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("total_value"))

  /** One event on the wire of the stateful form. */
  final case class SEvent(user_id: Long, ts: java.sql.Timestamp)

  /** One completed session. */
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** The open session carried in group state — constant size. */
  final case class OpenSession(startMicros: Long, lastMicros: Long, n: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000

  private def ts(micros: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  private[streaming] def close(userId: Long, s: OpenSession, gapMicros: Long): Session =
    Session(userId, ts(s.startMicros), ts(s.lastMicros + gapMicros), s.n)

  /** Fold a time-sorted run of event times into the open session,
    * emitting every session closed by a successor. Returns (closed
    * sessions in order, final open session).
    */
  private[streaming] def fold(
      userId: Long,
      open: Option[OpenSession],
      sorted: Iterator[Long],
      gapMicros: Long): (List[Session], Option[OpenSession]) = {
    // 1. fold the (sorted) batch into disjoint bursts ≥ gap apart
    val bursts = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    sorted.foreach { m =>
      bursts.lastOption match {
        case Some(b) if m - b.lastMicros < gapMicros =>
          bursts(bursts.length - 1) =
            OpenSession(b.startMicros, math.max(b.lastMicros, m), b.n + 1)
        case _ => bursts += OpenSession(m, m, 1)
      }
    }
    // 2. interval-merge the carried open session (it may regress earlier
    // than this batch's first event, or bridge several bursts) — a
    // general sorted merge, so cross-batch disorder inside the
    // state+batch scope resolves exactly
    val all = (bursts ++ open).sortBy(b => (b.startMicros, b.lastMicros))
    val merged = all.foldLeft(List.empty[OpenSession]) { (acc, b) =>
      acc match {
        case h :: t if b.startMicros - h.lastMicros < gapMicros =>
          OpenSession(h.startMicros, math.max(h.lastMicros, b.lastMicros), h.n + b.n) :: t
        case _ => b :: acc
      }
    }.reverse
    // every non-final burst has a successor ≥ gap later → final; the last
    // stays open for the next batch / the timeout
    merged match {
      case Nil => (Nil, None)
      case _ => (merged.init.map(close(userId, _, gapMicros)), Some(merged.last))
    }
  }

  /** Batch form of the custom-state operator: one pass per user, state
    * starts empty, the final open session flushes at end-of-group (a
    * bounded frame has no more data by definition). Output equals
    * [[sessionize]] minus the value aggregate.
    */
  def sessionizeState(events: DataFrame, gapMinutes: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events.select(col("user_id"), col("ts")).as[SEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, evs: Iterator[SEvent]) =>
        val (closed, open) =
          fold(uid, None, evs.map(e => micros(e.ts)).toArray.sorted.iterator, gapMicros)
        (closed ++ open.map(close(uid, _, gapMicros))).iterator
      }
  }

  /** Streaming form: the same fold as incremental state transitions.
    * Emits a session when a successor ≥ gap later arrives, or when the
    * event-time watermark passes its end (timeout). Disorder WITHIN the
    * state + current batch scope resolves exactly (the fold is a general
    * interval merge — late events regress the open session's start or
    * bridge bursts); the append-mode caveat is emission finality: once a
    * session emits, an even-later-arriving event older than it starts a
    * fresh session instead of amending — pick the watermark delay to
    * cover the source's disorder, the standard Append-mode contract.
    * Requires `withWatermark` on the input.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events.select(col("user_id"), col("ts")).as[SEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[SEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMicros + gap: no in-watermark event can
            // extend or precede-within this session any more — final
            val s = state.get
            state.remove()
            Iterator.single(close(uid, s, gapMicros))
          } else {
            val (closed, open) = fold(
              uid, state.getOption,
              evs.map(e => micros(e.ts)).toArray.sorted.iterator, gapMicros)
            open match {
              case Some(s) =>
                state.update(s)
                // fire when the watermark passes the session end; ceil
                // the micros→millis conversion so the timeout can never
                // land BEFORE the true end (a floor could close up to
                // 1 ms early, splitting an event landing in that sliver)
                state.setTimeoutTimestamp(
                  Math.floorDiv(s.lastMicros + gapMicros + 999L, 1000L))
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
