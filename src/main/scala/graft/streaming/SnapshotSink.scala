package graft.streaming

import graft.io.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming ingest into a [[graft.io.Snapshots]] versioned table: each
  * micro-batch commits as one new immutable version, carrying the batch
  * id as its transaction id. foreachBatch is at-least-once (a restart
  * replays the last uncommitted-to-the-sink batch); the idempotent
  * commit turns that into exactly-once — a replayed batch's txn id is
  * already in the manifest log and becomes a no-op. This is the
  * streaming→lakehouse-table pattern: readers keep snapshot isolation
  * and time travel over an endlessly-growing stream, and the sink never
  * needs a distributed lock.
  */
object SnapshotSink {

  /** Wire a streaming DataFrame to a snapshot table. Caller supplies the
    * checkpoint + trigger via the returned writer (or use
    * [[FileWatch.runAvailableNow]]) plus a stable `appId` naming THIS
    * writer — the txn id is "appId#batchId", so another stream (or the
    * same pipeline restarted with a fresh checkpoint, whose batch ids
    * restart at 0) writing the same table can never have its batches
    * mistaken for replays. Same contract as Delta's txnAppId.
    */
  def writer(stream: DataFrame, tableDir: String, appId: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      Snapshots.commitVersionIdempotent(batch.sparkSession, batch, tableDir, s"$appId#$batchId")
      ()
    }

  /** Append-mode streaming ingest: each micro-batch lands as ONE new
    * segment of a multi-segment version ([[Snapshots.appendRowsIdempotent]]),
    * so the LATEST version is always the whole accumulated table —
    * `Snapshots.read` answers "the table so far" directly, deletes and
    * updates compose on it, and per-trigger cost is O(batch) data + an
    * O(1) publish. [[writer]]'s one-version-per-batch layout remains for
    * consumers that process versions AS batches (the change-feed reading
    * pattern); this is the layout for consumers that read tables. Same
    * exactly-once contract via "appId#batchId" txns; the sink's
    * one-appId-one-checkpoint rule is what makes replays sequential
    * (see the concurrency note on appendRowsIdempotent).
    */
  def appendWriter(stream: DataFrame, tableDir: String, appId: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      Snapshots.appendRowsIdempotent(batch.sparkSession, tableDir, batch, s"$appId#$batchId")
      ()
    }

  /** Streaming MERGE — the CDC-apply pattern (a keyed upsert feed kept
    * live against a dimension table): each micro-batch applies as ONE
    * atomic [[Snapshots.mergeInto]] (matched rows replaced via DV +
    * re-append, unmatched inserted, optional delete predicate over the
    * batch row), exactly-once via the same "appId#batchId" txn contract.
    * The batch must carry the table schema and at most one row per key —
    * dedupe upstream (e.g. keep the latest change per key within the
    * trigger, the standard CDC compaction) or the merge fails loudly
    * rather than applying an ambiguous batch. Per-trigger cost: one MoR
    * scan + the batch rows written + O(1) publish.
    */
  def mergeWriter(
      stream: DataFrame,
      tableDir: String,
      appId: String,
      keyCols: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column] = None): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      Snapshots.mergeInto(batch.sparkSession, tableDir, batch, keyCols,
        deleteWhen, txnId = Some(s"$appId#$batchId"))
      ()
    }
}
