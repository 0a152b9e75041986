package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Continuous time-decayed leaderboard state — the streaming twin of the
  * batch `leaderboard_decayed` query, realizing the halve-and-add
  * contract its scaladoc promises: with power-of-two half-life weights
  * 2^(8−(W−week)) over CALENDAR weeks (week = floorDiv(day, 7)), moving
  * the horizon W forward one week exactly halves every score and adds
  * the new week — all integer, no float decay drift ever.
  *
  * The state per key is NOT a score (a score is horizon-relative and the
  * global horizon is unknowable inside a per-key group) but the per-week
  * event counts of the key's latest ≤9 calendar weeks — anything older
  * than 8 weeks behind the key's own max week weighs 0 at ANY horizon ≥
  * that max, so pruning by the local max is exact and the state is
  * BOUNDED at 9 (week, count) pairs per key forever. Emission is an
  * append-safe changelog of week-count snapshots with a bumped version;
  * [[scoresAt]] folds the latest snapshots into the exact leaderboard at
  * any chosen horizon week. Week bucketing is calendar-absolute (the
  * batch query buckets by day-distance from its horizon; distance
  * buckets roll per-event when the horizon moves, which is exactly why
  * the incremental form uses calendar weeks — the documented trade,
  * spec-pinned against a batch fold with identical week semantics).
  */
object StreamingDecayedLeaderboard {
  case class In(part: Long, day: Long)
  case class St(version: Long, weeks: List[(Long, Long)]) // (week, cnt), week desc
  case class Out(part: Long, version: Long, week: Long, cnt: Long)

  def weekly(recs: Dataset[In]): Dataset[Out] = {
    import recs.sparkSession.implicits._
    recs
      .groupByKey(_.part)
      .flatMapGroupsWithState[St, Out](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (part: Long, it: Iterator[In], state: GroupState[St]) =>
          val prev = state.getOption.getOrElse(St(0L, Nil))
          val add = it.map(r => Math.floorDiv(r.day, 7L)).toSeq
            .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
          if (add.isEmpty) Iterator.empty
          else {
            val base = prev.weeks.toMap
            val merged = base ++ add.map { case (w, c) => w -> (base.getOrElse(w, 0L) + c) }
            val mx = merged.keys.max
            val kept = merged.filter { case (w, _) => mx - w <= 8 }
              .toList.sortBy(-_._1)
            val next = St(prev.version + 1, kept)
            state.update(next)
            kept.iterator.map { case (w, c) => Out(part, next.version, w, c) }
          }
      }
  }

  /** Fold the changelog's latest per-part snapshots into the exact
    * leaderboard at horizon week `w`: weight 2^(8−(w−week)) for weeks
    * within 8 of the horizon, 0 beyond — the same integer weights as the
    * batch query, top-10 on the total (score desc, part asc) order.
    *
    * Horizon contract: `w` must be ≥ every kept week of every latest
    * snapshot. State pruning drops weeks more than 8 behind a key's OWN
    * max week; at any horizon ≥ that max the dropped weeks weigh 0, so
    * "all kept weeks ≤ w" is exactly the condition under which the fold
    * is exact. A smaller w would silently UNDERSTATE scores (pruned
    * weeks could carry weight again) — so the fold raises at execution
    * (assert_true) instead of returning a wrong leaderboard.
    */
  def scoresAt(changelog: DataFrame, w: Long): DataFrame = {
    val latest = changelog.groupBy("part").agg(max("version").as("version"))
    changelog.join(latest, Seq("part", "version"))
      .withColumn("dw", lit(w) - col("week"))
      // the guard lives INSIDE the consumed weight expression — a
      // standalone asserted-then-dropped column would be pruned by
      // Catalyst and never execute
      .withColumn("wt",
        when(col("dw") < 0,
          raise_error(concat(lit(s"scoresAt(w=$w): snapshot week "), col("week"),
            lit(" exceeds the horizon - pruned state would understate this score"))))
          .when(col("dw").between(0, 8),
            expr("shiftleft(1L, cast(8 - dw as int))")).otherwise(0L))
      .groupBy("part")
      .agg(sum((col("wt") * col("cnt")).cast(LongType)).cast(LongType).as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc("part"))
      .limit(10)
  }
}
