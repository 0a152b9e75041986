package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous top-k per key — the streaming twin of the native batch
  * [[org.apache.spark.sql.graftnative.TopKPerKey]] operator: a bounded
  * k-element leaderboard per key held in group state, so state is
  * k·|keys| forever no matter how many records stream through (the same
  * memory contract as the batch operator's heaps, carried across
  * micro-batches and checkpoint restarts).
  *
  * Emission contract: whenever a micro-batch CHANGES a key's top-k, the
  * full new leaderboard is emitted with a bumped per-key `version` —
  * an append-safe changelog of snapshots; the consumer keeps each key's
  * max-version group (the spec does exactly that and pins it equal to
  * the batch operator over the same data). Ordering is the total
  * (score desc, id asc), so ties resolve identically to the batch
  * operator; records are treated as immutable scored events (re-sending
  * an id inserts again — dedupe upstream if ids can repeat).
  */
object StreamingTopK {
  case class In(key: String, id: Long, score: Long)
  case class St(version: Long, top: List[(Long, Long)]) // (score, id), sorted
  case class Out(key: String, version: Long, rank: Int, id: Long, score: Long)

  private def order(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def topK(recs: Dataset[In], k: Int): Dataset[Out] = {
    import recs.sparkSession.implicits._
    recs
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Out](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[In], state: GroupState[St]) =>
          val prev = state.getOption.getOrElse(St(0L, Nil))
          val merged = (prev.top ++ it.map(r => (r.score, r.id)))
            .sortWith(order)
            .take(k)
          if (merged == prev.top) Iterator.empty
          else {
            val next = St(prev.version + 1, merged)
            state.update(next)
            merged.iterator.zipWithIndex.map { case ((s, id), i) =>
              Out(key, next.version, i + 1, id, s)
            }
          }
      }
  }
}
