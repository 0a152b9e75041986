package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via flatMapGroupsWithState: gap-based session
  * assembly per user. The open session lives in versioned group state
  * (bounded: one record per active user) and closes either when a later
  * event exceeds the gap or when the processing-time timeout fires —
  * the scalable replacement for the reference's driver-side seen-list
  * state pattern (SURVEY.md §2A O7).
  */
object StatefulSessions {
  case class Ev(user_id: Long, ms: Long, value: Double)
  case class OpenSession(start: Long, lastMs: Long, n: Int)
  case class Session(user_id: Long, session_start: Long, session_end: Long, n_events: Int)

  def sessionize(
      events: Dataset[Ev],
      gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](OutputMode.Append, timeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.lastMs, s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ms))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                // max/min guard: a late event from an earlier micro-batch
                // must not move the session extent backwards
                case Some(s) if e.ms - s.lastMs <= gapMs =>
                  open = Some(OpenSession(
                    math.min(s.start, e.ms), math.max(s.lastMs, e.ms), s.n + 1))
                case Some(s) =>
                  closed += Session(user, s.start, s.lastMs, s.n)
                  open = Some(OpenSession(e.ms, e.ms, 1))
                case None =>
                  open = Some(OpenSession(e.ms, e.ms, 1))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                  state.setTimeoutDuration(gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
