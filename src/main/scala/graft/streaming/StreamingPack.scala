package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing: the incremental counterpart of
  * [[graft.ext.CorpusOps.packSequencesScalable]] for an ingest pipeline
  * that packs documents into fixed token-budget training sequences AS
  * THEY ARRIVE, instead of re-packing the corpus per batch. State per
  * source is a single running token count (O(1) per key — bounded no
  * matter how much history has streamed through), and each document's
  * (seq_id, straddles) assignment uses the exact integer chunk math of
  * the batch packer, so a stream processed in manifest order emits
  * bit-identical assignments to a batch run over the same documents
  * (StreamingPackSpec proves equality across micro-batch boundaries).
  *
  * Ordering contract (same as the batch packer's doc_id sort): documents
  * must arrive per-source in manifest (doc_id) order across micro-batches;
  * within a micro-batch any order is fine (the group iterator is sorted).
  * A late out-of-order doc would change assignments — that is inherent to
  * any incremental packer, and the batch packer is the recovery path.
  */
object StreamingPack {
  case class DocTok(source: String, doc_id: Long, n_tok: Long)
  case class PackState(cum: Long)
  case class PackedDoc(
      source: String,
      doc_id: Long,
      n_tok: Long,
      seq_id: Long,
      straddles: Boolean)

  def packStream(docs: Dataset[DocTok], budget: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[DocTok], state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            val before = cum
            cum += d.n_tok
            // operands non-negative, so truncating / == floor == the
            // batch packer's integer `div` (CorpusOps.chunkByCum)
            val seq = before / budget
            PackedDoc(src, d.doc_id, d.n_tok, seq, (cum - 1) / budget > seq)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }
}
