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
    * [[Rows]] times. */
  def cmsEntries(tok: Column): Column = {
    val h = PortableHash.hash60(tok)
    explode(array((0 until Rows).map { i =>
      struct(lit(i.toLong).as("r"), (PortableHash.affine(h, i) % Width).as("b"))
    }: _*))
  }

  /** The full sketch of a (doc_id, text) frame: tokenize, tag, and ONE
    * map-side-combined aggregation whose key space is the 1,024 cells.
    * Works identically on a batch frame and a streaming frame — on a
    * stream the cell counters ARE the aggregation state, so state size
    * is Rows×Width regardless of ingest volume. */
  def cmsSketch(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(cmsEntries(col("tok")).as("e"))
      .select(col("e.r").as("r"), col("e.b").as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).cast("long").as("c"))
}
