package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `op_pps_sample` operator: systematic
  * probability-proportional-to-size sampling over an unbounded stream.
  * A document is picked when its span of the per-source running weight
  * crosses a multiple of `step` — so each source's expected pick rate is
  * (source weight / step), exactly the batch operator's rule, applied to
  * the stream's arrival order.
  *
  * State per key is ONE long (the running weight) — independent of
  * stream volume; key cardinality is the number of sources, so the state
  * table is dimension-sized and needs no TTL (the same bounded-state
  * shape as [[StreamingBudget]]/[[StreamingPack]]). The crossing test is
  * pure int64 arithmetic — replay-deterministic, no rand().
  *
  * Ordering: the batch operator samples in deterministic portable-hash
  * order; a stream has no second look, so the weight accumulates in
  * arrival order — within a micro-batch re-sorted by doc_id so replays
  * of the same batch pick the same documents (the determinism trade all
  * the streaming twins make for intra-batch order).
  */
object StreamingSample {

  case class WeightedDoc(source: String, doc_id: Long, w: Long)

  case class SampleState(cumWeight: Long)

  case class Pick(source: String, doc_id: Long, w: Long, cum_weight: Long)

  /** `docs` must have columns (source: string, doc_id: long, w: long).
    * Emits the documents whose weight span crosses a `step` boundary:
    * (cum div step) > ((cum - w) div step). */
  def sampleStream(docs: DataFrame, step: Long): Dataset[Pick] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"), col("doc_id").cast("long"),
        col("w").cast("long"))
      .as[WeightedDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, batch: Iterator[WeightedDoc],
            state: GroupState[SampleState]) =>
          var cum = state.getOption.map(_.cumWeight).getOrElse(0L)
          val picks = batch.toSeq.sortBy(_.doc_id).flatMap { doc =>
            val before = cum
            cum += doc.w
            if (cum / step > before / step)
              Some(Pick(source, doc.doc_id, doc.w, cum))
            else None
          }
          state.update(SampleState(cum))
          picks.iterator
      }
  }
}
