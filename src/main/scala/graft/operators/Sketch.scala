package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Count-min sketch construction — the mergeable frequency summary for
  * key spaces too large to hold (URL / user-agent / query logs whose
  * "vocabulary" is itself TBs). Geometry: [[Rows]] independent members
  * of the portable affine hash family over [[Width]] int64 counters
  * each — 1,024 cells total, the whole point being that this is the
  * ONLY state regardless of corpus size, and that cell-wise addition
  * merges per-partition, per-hour, or per-cluster sketches exactly.
  *
  * Deterministic by construction (integer sums over MD5-affine hashes —
  * no sampling, no RNG), so unlike HLL/quantile sketches the full cell
  * frame replays bit-for-bit in the DuckDB oracle
  * (`corpus_cms_build` / `corpus_cms_topk`,
  * [[graft.queries.TextQueries]]).
  */
object Sketch {

  /** Independent hash rows (affine family members 0..Rows-1). */
  val Rows = 4

  /** Counters per row. Per-row overestimate is bounded in expectation
    * by N/Width; the point estimate takes the min over [[Rows]]. */
  val Width = 256

  /** The per-token (r, b) cell tags: ONE map-only explode emitting
    * [[Rows]] structs per occurrence — the corpus is read once, not
    * [[Rows]] times. The COMPOSABLE form: [[cmsSketch]] now rides the
    * compiled [[graft.functions.TextHashFunctions.CmsCells]] partial
    * instead (per-document, not per-token — SketchSpec pins the two
    * bit-identical); this stays as the oracle-shaped reference. */
  def cmsEntries(tok: Column): Column = {
    val h = PortableHash.hash60(tok)
    explode(array((0 until Rows).map { i =>
      struct(lit(i.toLong).as("r"), (PortableHash.affine(h, i) % Width).as("b"))
    }: _*))
  }

  /** [[cmsSketch]] built from the composable per-token tags — the
    * equivalence spec's reference side. */
  def cmsSketchComposable(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(cmsEntries(col("tok")).as("e"))
      .select(col("e.r").as("r"), col("e.b").as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).cast("long").as("c"))

  /** Quarter-bit quantile-histogram bucket of a token-count column:
    * length(bin(n⁴)) ≈ 4·log₂ n — consecutive buckets a factor
    * 2^(1/4) ≈ 1.19 apart, so the ≤ ~128-cell histogram is a ≤ 19 %
    * relative-error quantile summary at ANY corpus size. `n` saturates
    * at 55,108 (the largest value whose 4th power fits int64), so
    * longer documents land in the top bucket instead of silently
    * wrapping (Spark) or raising (DuckDB). */
  def qhistBucket(n: Column): Column = {
    val m = least(n, lit(55108L))
    length(bin(m * m * m * m)).cast("long")
  }

  /** The quantile histogram of a (doc_id, text) frame: map-only bucket
    * tag + ONE map-side-combined aggregation whose key space is the
    * cells. Mergeable by cell-wise addition (per-partition/per-hour
    * sketches sum exactly — `corpus_qhist_merge` is the oracle-graded
    * law) and streamable: on a stream the ≤ ~128 cells ARE the
    * aggregation state at any ingest volume (StreamingSpec pins the
    * drained stream equal to the batch histogram). */
  def qhistSketch(docs: DataFrame): DataFrame =
    docs
      .select(qhistBucket(size(TextAnalysis.tokens(col("text"))).cast("long"))
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-document sparse partial sketch
    * ([[graft.functions.TextHashFunctions.CmsCells]]) — the
    * intermediate form between the per-token tags and the full
    * aggregate, kept for consumers that need per-document cell counts. */
  def cmsSketchPerDoc(docs: DataFrame): DataFrame =
    docs
      .select(explode(graft.functions.TextHashFunctions.cmsCells(
        TextAnalysis.tokens(col("text")), Rows, Width)).as("e"))
      .select(col("e.r").as("r"), col("e.b").as("b"), col("e.c").as("pc"))
      .groupBy(col("r"), col("b"))
      .agg(sum(col("pc")).as("c"))

  /** The full sketch of a (doc_id, text) frame: ONE typed imperative
    * aggregation ([[graft.functions.SketchAggregates.CmsSketchAgg]])
    * whose buffer IS the dense Rows×[[Width]] cell table — one
    * compiled update per DOCUMENT (hash60 once per occurrence),
    * map-side combined per partition, merged cell-wise; the sparse
    * (r, b, c) frame is recovered by posexplode + zero-drop on the
    * single 1,024-entry result row. No per-token or per-cell rows ever
    * flow through a hash aggregate. Works identically on a batch frame
    * and a streaming frame — on a stream the serialized buffer IS the
    * aggregation state, so state size is Rows×Width regardless of
    * ingest volume. */
  def cmsSketch(docs: DataFrame): DataFrame =
    docs
      .agg(graft.functions.SketchAggregates.cmsSketchAgg(
        TextAnalysis.tokens(col("text")), Rows, Width).as("cells"))
      .select(posexplode(col("cells")).as(Seq("pos", "c")))
      .filter(col("c") =!= 0L)
      .select((col("pos") - pmod(col("pos"), lit(Width))).cast("long")
          .divide(lit(Width)).cast("long").as("r"),
        pmod(col("pos"), lit(Width)).cast("long").as("b"),
        col("c"))
}
