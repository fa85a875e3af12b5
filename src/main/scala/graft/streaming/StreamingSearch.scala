package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Similarity

/** Streaming twin of the batch `sim_pq_adc` query: ADC SERVING — the
  * other half of the ingest-while-serving pair next to
  * [[StreamingIndex]]. Queries arrive on a stream; each micro-batch
  * runs the SAME ADC kernel ([[Similarity.pqAdcSearch]]) the batch
  * query uses, against the static PQ-coded corpus and trained
  * codebook.
  *
  * `foreachBatch` is the honest architecture here, not a fallback: ADC
  * needs a per-query aggregation plus a top-k, which Structured
  * Streaming's append mode cannot express over an unbounded stream —
  * and a real vector-search service answers each request batch against
  * the index AS OF that moment, which is exactly micro-batch
  * semantics. Per batch: the query-side distance table (|batch| × 32
  * rows) broadcasts onto the coded corpus, the corpus never
  * reshuffles, and results flow to the caller's sink. Reusing the
  * batch kernel verbatim is the correctness argument — StreamingSpec
  * pins streamed results equal to the batch query on the same query
  * set.
  */
object StreamingSearch {

  /** `queries`: streaming frame with (query_id long, qv array<double>,
    * integer-quantized). `codes`/`cb`: the static coded corpus and
    * trained codebook (see [[Similarity.pqAdcSearch]]). Each
    * micro-batch's top-k per query is handed to `sink`. */
  def serveWriter(queries: DataFrame, codes: DataFrame, cb: DataFrame,
      k: Int)(sink: DataFrame => Unit): DataStreamWriter[Row] =
    queries.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(Similarity.pqAdcSearch(batch, codes, cb, k))
      }
}
