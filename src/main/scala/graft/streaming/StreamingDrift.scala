package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift detection — the continuous-ingest twin of
  * the batch drift family (`source_tv_divergence`, `anomaly_seasonal`,
  * `changepoint_cusum`): as micro-batches of per-key observations arrive,
  * each batch's mean is tested against the reference mean accumulated
  * from every batch before it, and a per-(key, batch) verdict is emitted.
  * This is the audit a training-data pipeline runs while a crawl is
  * STILL LANDING: "did source X's value distribution move?", answered at
  * arrival time instead of by a full-corpus recompute.
  *
  * State per key is two longs (count, sum of integer cents) — bounded by
  * |keys| forever, never by stream length. The mean-shift test is the
  * repo's house style: cross-multiplied integers, no division —
  * `S·|s_b·N − S·n_b| thresholds` evaluated in BigInt so no scale's
  * cents·count product can overflow — drift iff the batch mean deviates
  * from the reference mean by more than 20% of it
  * (5·|s_b·N − S·n_b| > S·n_b). Sums of longs are order-free, so the
  * verdict is deterministic under any intra-batch ordering; the first
  * batch for a key establishes the reference and reports no drift. The
  * reference then absorbs every batch, drifted or not — the detector is
  * a CENSUS of shifts, not a gate (a quarantining variant would skip the
  * update; that one-line policy is the production knob, not the
  * algorithm).
  */
object StreamingDrift {
  case class Obs(key: String, obs_id: Long, cents: Long)
  case class Ref(n: Long, sum: Long)
  case class Verdict(
      key: String,
      batch_n: Long,
      batch_sum: Long,
      ref_n: Long,
      ref_sum: Long,
      drifted: Boolean)

  /** Drift iff 5·|s_b·N − S·n_b| > S·n_b, i.e. |mean_b − mean_ref| >
    * mean_ref/5, exact in BigInt. Pure so the spec can fold the same
    * arithmetic over a batch replay.
    */
  def isDrift(refN: Long, refSum: Long, nb: Long, sb: Long): Boolean = {
    val lhs = (BigInt(sb) * refN - BigInt(refSum) * nb).abs * 5
    lhs > BigInt(refSum) * nb
  }

  def detect(obs: Dataset[Obs]): Dataset[Verdict] = {
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[Ref, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], state: GroupState[Ref]) =>
          var nb = 0L
          var sb = 0L
          it.foreach { o => nb += 1; sb += o.cents }
          val Ref(n, sum) = state.getOption.getOrElse(Ref(0L, 0L))
          val verdict =
            Verdict(key, nb, sb, n, sum, n > 0 && isDrift(n, sum, nb, sb))
          state.update(Ref(n + nb, sum + sb))
          Iterator.single(verdict)
      }
  }
}
