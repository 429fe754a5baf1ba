package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom per-key state — the Structured
  * Streaming pattern the reference's real-time lakehouse diagram implies
  * (docs/12:211-236: stream + batch into one unified table) but cannot
  * express with windowed aggregation alone: a session has data-dependent
  * extent (closed by a quiet gap, not a fixed window).
  *
  * `flatMapGroupsWithState` keeps one [[SessionState]] per user:
  *  - an event within `gapMs` of the last one extends the open session;
  *  - an event beyond the gap CLOSES the open session (emitted downstream)
  *    and opens a new one;
  *  - an idle key's open session is flushed by event-time timeout once the
  *    watermark passes last-event-time + gap, so state is bounded and the
  *    sink eventually sees every session. Emitted sessions append to a
  *    Graft table via [[GraftSink]] — each micro-batch one atomic commit.
  *
  * Scale shape: state is O(active keys), shuffled by key (hash exchange),
  * and every event is touched once — the standard 100 TB streaming plan.
  */
object Sessionize {

  /** `ts` must be the stream's watermarked event-time column (keeping the
    * watermark-tagged column in the Dataset is what lets the state operator
    * use event-time timeouts).
    */
  case class Event(userId: Long, ts: java.sql.Timestamp)

  case class SessionState(startMs: Long, lastMs: Long, events: Int)

  case class Session(userId: Long, startMs: Long, endMs: Long, events: Int)

  /** Shared gap fold: closed sessions + the still-open tail (if any). */
  private def fold(userId: Long, sortedTsMs: Seq[Long], gapMs: Long,
                   openState: Option[SessionState]): (Seq[Session], Option[SessionState]) = {
    var open = openState
    val closed = Seq.newBuilder[Session]
    sortedTsMs.foreach { tsMs =>
      open match {
        case Some(s) if tsMs - s.lastMs <= gapMs =>
          open = Some(s.copy(lastMs = math.max(s.lastMs, tsMs), events = s.events + 1))
        case Some(s) =>
          closed += Session(userId, s.startMs, s.lastMs, s.events)
          open = Some(SessionState(tsMs, tsMs, 1))
        case None =>
          open = Some(SessionState(tsMs, tsMs, 1))
      }
    }
    (closed.result(), open)
  }

  /** Batch sessionization — the same fold over a bounded Dataset (one
    * shuffle on userId; per-key events held in memory, which is bounded by
    * the busiest key, not the table). Every session is closed at end of
    * input. Oracle-equivalent to the SQL lag/cumsum session assignment.
    */
  def sessionsBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroups { (userId: Long, it: Iterator[Event]) =>
        val sorted = it.map(_.ts.getTime).toSeq.sorted
        val (closed, open) = fold(userId, sorted, gapMs, None)
        (closed ++ open.map(s => Session(userId, s.startMs, s.lastMs, s.events))).iterator
      }
  }

  /** `events` must be watermarked on its event-time column BEFORE calling
    * (the timeout clock is the watermark). Output mode: Append.
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startMs, s.lastMs, s.events))
          } else {
            // fold this micro-batch's events (sorted: state transitions are
            // order-sensitive) into the open session, emitting closed ones
            val sorted = batch.map(_.ts.getTime).toSeq.sorted
            val (closed, open) = fold(userId, sorted, gapMs, state.getOption)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }
}
