package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the streaming twin of the batch
  * `attribution_last_touch` query: every purchase is credited, at arrival
  * time, to the user's most recent preceding non-purchase event type
  * ('organic' when none). The window formulation needs the whole history
  * behind it; here the per-user state is exactly ONE (ms, event_id,
  * channel) triple, so state is bounded by |active users| forever — the
  * 100 TB-stream posture (a TTL timeout is the production knob for
  * retiring dormant users; deliberately not set here so the spec can
  * replay checkpoints deterministically).
  *
  * Ordering contract: within a micro-batch events fold in (ms, event_id)
  * order; across micro-batches the state carries the latest touch, so
  * attribution equals the batch query whenever batch boundaries respect
  * event time (AvailableNow over time-partitioned files, Kafka per-key
  * ordering). A late-arriving touch OLDER than the stored one never
  * regresses state (same max-guard as [[StatefulSessions]]); a purchase
  * arriving before its touch is attributed to what the stream knew — the
  * honest streaming semantics, pinned by the spec's ordered-batch case.
  */
object StreamingAttribution {
  case class Ev(user_id: Long, ms: Long, event_id: Long, event_type: String, cents: Long)
  case class Touch(ms: Long, eventId: Long, channel: String)
  case class Attributed(user_id: Long, event_id: Long, channel: String, cents: Long)

  def attribute(events: Dataset[Ev]): Dataset[Attributed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Touch, Attributed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[Touch]) =>
          val sorted = it.toSeq.sortBy(e => (e.ms, e.event_id))
          val out = Seq.newBuilder[Attributed]
          var touch = state.getOption
          sorted.foreach { e =>
            if (e.event_type == "purchase") {
              out += Attributed(
                user, e.event_id, touch.map(_.channel).getOrElse("organic"), e.cents)
            } else {
              val newer = touch.forall(t =>
                t.ms < e.ms || (t.ms == e.ms && t.eventId < e.event_id))
              if (newer) touch = Some(Touch(e.ms, e.event_id, e.event_type))
            }
          }
          touch.foreach(state.update)
          out.result().iterator
      }
  }
}
