package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming twin of the batch `dedup_exact` keeper semantics: the
  * FIRST arrival of each normalized-text digest passes, later copies
  * are dropped — the ingest-time dedup gate of a streaming corpus
  * intake (a crawler emits the same page many times; only one copy
  * should reach the curation pipeline).
  *
  * State is one entry per distinct digest seen inside the watermark
  * horizon — Spark's `dropDuplicatesWithinWatermark` evicts entries
  * older than the event-time watermark, so state is bounded by the
  * dedup horizon × arrival rate, NOT by total corpus size (the
  * unbounded-state trap of plain `dropDuplicates` on an infinite
  * stream). The digest is [[Dedup.normalize]] + md5 — byte-identical
  * to the batch operator's grouping key, so a document admitted here
  * lands in the same group the batch pipeline would assign.
  *
  * The batch operator elects the minimum id per group; a stream has no
  * second look, so the keeper is the first arrival — the same
  * arrival-order determinism trade [[StreamingBudget]] documents.
  */
object StreamingDedup {

  /** `docs` must have (text: string, `tsCol`: timestamp) plus any other
    * columns. Emits the admitted (first-seen) documents with ALL input
    * columns plus their `text_hash` digest — columns pass through the
    * gate so downstream stateful stages ([[StreamingIntake]]) need no
    * stream-stream self-join (which would hold unbounded join state) to
    * recover them. */
  def dedupStream(docs: DataFrame, tsCol: String, delay: String): DataFrame =
    docs
      .withColumn("text_hash", md5(Dedup.normalize(col("text"))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** [[dedupStream]] for callers that computed the `text_hash` digest
    * (and every other per-document value they need) in a map-side
    * projection BEFORE the gate — the admission decision reads only
    * the digest, so upstream can DROP the text payload before the
    * digest-keyed shuffle. At 100 TB the payload dominates the shuffle
    * volume of a naive gate (the state row was always digest-sized;
    * the in-flight exchange was not) — [[StreamingIntake]]'s composed
    * pipelines all take this form. Same watermark eviction, same
    * first-arrival-wins semantics. */
  def dedupStreamPreHashed(docs: DataFrame, tsCol: String,
      delay: String): DataFrame =
    docs
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")
}
