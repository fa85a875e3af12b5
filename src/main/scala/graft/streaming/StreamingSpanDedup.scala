package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SpanDedup

/** Streaming substring-span decontamination — the serving twin of the
  * batch `curate_substring_decontam` row: arriving documents are
  * stripped, AT INGEST, of every span they share with a held-out
  * reference corpus (benchmark/test text), so a leaked benchmark
  * answer pasted into an otherwise-unique training document never
  * reaches the training set.
  *
  * Shape (the trained-artifact serving doctrine): the reference gram
  * index ([[SpanDedup.cappedGrams]] — positional 8-grams of the
  * held-out corpus, occurrence lists capped at build time) is built
  * ONCE offline and checkpointed; each micro-batch is STATELESS —
  * map-only gram extraction over the arrivals, one equi-join against
  * the static index, the same (ref doc, arriving doc, diagonal)
  * island merge into maximal spans, merged per-doc removal intervals,
  * and the map-only higher-order strip. No state store: a document
  * arrives whole, so nothing spans batches; per-batch work is
  * |batch grams| × ≤ occCap joined rows regardless of how large the
  * reference corpus is.
  *
  * StreamingSpec pins the streamed output row-identical to the batch
  * kernels ([[SpanDedup.spansAgainst]] + [[SpanDedup.stripSpans]]) on
  * the same documents — and those kernels are exactly what the
  * oracle-green batch row computes for the train×test direction.
  */
object StreamingSpanDedup {

  /** Per micro-batch: strip arrivals against the static reference
    * index and emit (idCol, n_toks, n_removed, clean_text) rows.
    * `refGrams`: a checkpointed [[SpanDedup.cappedGrams]] frame.
    * `refSketch`: the index's Bloom gram sketch
    * ([[SpanDedup.refGramSketch]]), built offline next to the index —
    * nearly every arriving gram misses the reference, and the sketch
    * drops those scan-side BEFORE the join's exchange (results
    * row-identical by the exact join; spec-pinned). Pass None to run
    * the bare join. */
  def decontamStripWriter(docs: DataFrame, refGrams: DataFrame,
      idCol: String, textCol: String, k: Int, minLen: Int,
      refSketch: Option[Array[Byte]] = None)(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spans = SpanDedup.spansAgainst(
          refGrams, batch, idCol, textCol, k, minLen, refSketch)
        sink(SpanDedup.stripSpans(batch, idCol, textCol, spans))
      }
}
