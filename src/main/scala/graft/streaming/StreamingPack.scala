package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `curate_pack_chunks` operator: per-source
  * running token counts held as keyed state, each arriving document
  * assigned its context-window chunk span on admission.
  *
  * State per key is ONE long (the source's token stream position) —
  * independent of stream volume; key cardinality is the number of
  * sources, so no TTL is needed (the state table is dimension-sized by
  * construction, the same argument as [[StreamingBudget]]).
  *
  * Ordering: the batch operator packs in deterministic portable-hash
  * order; a stream has no second look, so packing is arrival order —
  * within a micro-batch, re-sorted by doc_id so replays of the same
  * batch produce the same placements (the intra-batch determinism trade
  * [[StreamingBudget]] and [[StreamingFunnel]] make).
  */
object StreamingPack {

  case class PackDoc(source: String, doc_id: Long, n_tokens: Long)

  case class PackState(cumTokens: Long)

  case class Placement(source: String, doc_id: Long, n_tokens: Long,
      first_chunk: Long, last_chunk: Long, straddles: Boolean)

  /** `docs` must have columns (source: string, doc_id: long,
    * n_tokens: long). Each document occupies token positions
    * [cum, cum + n) of its source's stream; its chunk span is pure
    * arithmetic on those endpoints, identical to the batch operator's
    * (cum-n) div ctx .. (cum-1) div ctx. */
  def packStream(docs: DataFrame, ctx: Long): Dataset[Placement] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"))
      .as[PackDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, batch: Iterator[PackDoc],
            state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cumTokens).getOrElse(0L)
          val placed = batch.toSeq.sortBy(_.doc_id).map { doc =>
            val start = cum
            cum += doc.n_tokens
            val first = start / ctx
            val last = (cum - 1) / ctx
            Placement(source, doc.doc_id, doc.n_tokens, first, last,
              first != last)
          }
          state.update(PackState(cum))
          placed.iterator
      }
  }
}
