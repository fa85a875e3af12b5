package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Composed streaming corpus intake — the streaming counterpart of the
  * batch `curate_recipe` composition proof: TWO stateful operators
  * chained in ONE streaming query.
  *
  *   raw docs → exact-dedup gate ([[StreamingDedup]],
  *   `dropDuplicatesWithinWatermark` — state bounded by the watermark
  *   horizon) → token count (map-only) → context-window chunk packing
  *   ([[StreamingPack]], one long of state per source).
  *
  * The load-bearing composition property: a re-crawled duplicate is
  * dropped BEFORE the packer, so it does not advance its source's token
  * stream — dedup-then-pack and pack-then-dedup produce different
  * corpora, and only the former matches what the batch recipe
  * (dedup → pack over distinct docs) computes. The dedup gate passes
  * every input column through, so no stream-stream self-join (and its
  * unbounded join state) is needed to recover `source` after the gate.
  *
  * Spark executes both stateful operators in the same micro-batch
  * pipeline (multiple stateful operators in append mode); the spec pins
  * the end-to-end semantics across batches.
  */
object StreamingIntake {

  /** `docs` must have (source: string, doc_id: long, text: string,
    * `tsCol`: timestamp). */
  def intakeStream(docs: DataFrame, tsCol: String, delay: String,
      ctx: Long): Dataset[StreamingPack.Placement] =
    StreamingPack.packStream(
      StreamingDedup.dedupStream(docs, tsCol, delay)
        .select(col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
      ctx)
}
