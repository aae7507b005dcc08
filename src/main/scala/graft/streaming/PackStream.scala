package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (doc_id, shard, n_tokens) unit of the incoming document stream. */
case class DocTok(doc_id: Long, shard: Long, n_tokens: Long)

/** A doc's assigned place in the packed token stream. */
case class PackedDoc(doc_id: Long, shard: Long, n_tokens: Long,
    bin_id: Long, bin_offset: Long)

/** Per-shard packer state: the currently-open bin and its fill. */
case class PackState(bin: Long, fill: Long)

/** Streaming twin of [[graft.operators.Pack.packGreedy]]: greedy
  * no-split packing as a CONTINUOUS ingest. flatMapGroupsWithState
  * keyed on the shard carries (open bin, fill) across micro-batches,
  * so batch N+1's docs keep filling the bin batch N left open —
  * exactly the fold the batch operator runs, applied to the
  * concatenated arrival order. State is two longs per shard (bounded
  * by the shard count, not the stream length — nothing to watermark).
  *
  * Within a micro-batch the group iterator is sorted by doc_id for a
  * deterministic fold; ACROSS batches order is arrival order, which
  * is the streaming semantic (a doc arriving later packs later).
  */
object PackStream {

  def pack(docs: Dataset[DocTok], cap: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, it: Iterator[DocTok], state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(0L, 0L))
          val out = it.toIndexedSeq.sortBy(_.doc_id).map { dt =>
            // same rule as the batch fold: roll to a new bin when the
            // doc doesn't fit whole; an oversize doc owns its bin
            if (st.fill != 0L && st.fill + dt.n_tokens > cap)
              st = PackState(st.bin + 1L, 0L)
            val off = st.fill
            st = PackState(st.bin, st.fill + dt.n_tokens)
            PackedDoc(dt.doc_id, shard, dt.n_tokens, st.bin, off)
          }
          state.update(st)
          out.iterator
      }
  }
}
