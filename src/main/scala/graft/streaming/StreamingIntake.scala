package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
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

  /** Per-source quality-admission cutoffs for [[recipeStream]] — the
    * batch-side half of the streaming recipe. The batch quality gate
    * (`curate_quality_gate`) admits the per-source top NTILE(4) quartile
    * ordered by (quality desc, doc_id); because doc_id makes that order
    * total, quartile membership is EXACTLY equivalent to comparing
    * against the boundary row's (quality, doc_id) key — so the gate
    * compiles to one tiny (source, qcut, dcut) frame plus a stateless
    * broadcast filter on the stream. This is the documented 100 TB
    * shape of the quality gate (cutoffs from a batch corpus scan or
    * sample, map-only admission) made exact for the spec's equality pin.
    *
    * `docs` must have (source, doc_id, text). */
  def qualityCutoffs(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    docs
      .select(col("source"), col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("qt", ntile(4).over(w))
      .filter(col("qt") === 1)
      // boundary = the LAST admitted row in (quality desc, doc_id asc)
      // order = max of the order-isomorphic (-quality, doc_id) struct
      .groupBy(col("source"))
      .agg(max(struct((-col("quality")).as("nq"), col("doc_id").as("d")))
        .as("b"))
      .select(col("source"), (-col("b.nq")).as("qcut"), col("b.d").as("dcut"))
  }

  /** Streaming form of the curation recipe: quality gate (STATELESS —
    * broadcast cutoffs from [[qualityCutoffs]], map-side filter) →
    * exact-dedup gate ([[StreamingDedup]], the ONE stateful stage,
    * watermark-bounded) → split tag (map-only hash arithmetic, identical
    * buckets to the batch `curate_split`). Emits the admitted documents
    * as (source, doc_id, n_tokens, split).
    *
    * vs the batch `curate_recipe` capstone: the batch decontamination
    * stage drops near-duplicates via the MinHash pair graph (needs the
    * whole corpus — inherently batch); the streaming recipe's dedup is
    * the exact-digest gate, the ingest-time half of the same policy.
    * The spec pins this DAG equal to its batch replay (gate →
    * keep-first-per-digest → split) on a replayed fixture slice. */
  def recipeStream(docs: DataFrame, cutoffs: DataFrame, tsCol: String,
      delay: String): DataFrame = {
    val gated = docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .join(broadcast(cutoffs), Seq("source"))
      .filter(col("quality") > col("qcut") ||
        (col("quality") === col("qcut") && col("doc_id") <= col("dcut")))
    val admitted = StreamingDedup.dedupStream(gated, tsCol, delay)
    val bucket = PortableHash.hash60(
      concat(col("doc_id").cast("string"), lit("|split"))) % 100
    admitted.select(col("source"), col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
  }
}
