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

  /** Streaming state: ALL of a key's still-open sessions, sorted by start.
    * One open session is not enough once micro-batches interleave with the
    * watermark: a late-but-valid event (above watermark, before the open
    * session) must form or extend an EARLIER candidate session — and a
    * later arrival may bridge two candidates into one. Bounded: the
    * watermark closes candidates from the left, so the list length is
    * O(out-of-orderness / gap), not O(stream).
    */
  case class SessionBuf(sessions: Seq[SessionState])

  case class Session(userId: Long, startMs: Long, endMs: Long, events: Int)

  /** Interval-union with gap: existing candidates + this batch's events
    * (each a 1-event point session), sorted by start, merged when the next
    * start is within `gapMs` of the running end. Handles events BEFORE an
    * open session (start is lowered), and arrivals that bridge candidates.
    */
  private def mergeCandidates(existing: Seq[SessionState], tsMs: Seq[Long],
                              gapMs: Long): Seq[SessionState] = {
    val all = (existing ++ tsMs.map(t => SessionState(t, t, 1)))
      .sortBy(s => (s.startMs, s.lastMs))
    val out = scala.collection.mutable.ArrayBuffer[SessionState]()
    all.foreach { s =>
      out.lastOption match {
        case Some(p) if s.startMs - p.lastMs <= gapMs =>
          out(out.size - 1) = SessionState(
            p.startMs, math.max(p.lastMs, s.lastMs), p.events + s.events)
        case _ => out += s
      }
    }
    out.toSeq
  }

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
    implicit val stateEnc = Encoders.product[SessionBuf]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionBuf]) =>
          // a candidate is FINAL only once the watermark passes its end +
          // gap — an "event-closed" emission before that would be wrong,
          // because a late-but-valid arrival could still extend or bridge
          // it. Both paths below therefore emit by watermark and re-arm
          // the timeout at the EARLIEST still-open close time.
          val wm = state.getCurrentWatermarkMs()
          val candidates =
            if (state.hasTimedOut) state.get.sessions
            else mergeCandidates(state.getOption.map(_.sessions).getOrElse(Nil),
              batch.map(_.ts.getTime).toSeq, gapMs)
          val (done, open) = candidates.partition(_.lastMs + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(SessionBuf(open))
            state.setTimeoutTimestamp(open.map(_.lastMs).min + gapMs)
          } else state.remove()
          done.iterator.map(s => Session(userId, s.startMs, s.lastMs, s.events))
      }
  }
}
