package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic shard export — the TERMINAL stage of a training-data
  * pipeline: assign the curated corpus to `nShards` training shards
  * with (a) a reproducible, seed-free global interleave and (b)
  * near-perfectly balanced per-shard token counts. Everything upstream
  * (curation, packing, budgeting, mixing) computes up to the shard
  * boundary; this operator computes the boundary itself — the
  * manifest a 100 TB run hands to the trainer.
  *
  * Construction (pure relational, no rand(), no driver loop):
  *
  *   1. interleave order: each unit (document or chunk) is ranked by a
  *      [[PortableHash]] of its id — the codebase's replayable-
  *      randomness doctrine. Same input ⇒ byte-identical order, on any
  *      partitioning, any cluster, any engine version (the DuckDB
  *      oracle replays it bit-exactly).
  *   2. global token prefix sum over that order via the distributed
  *      two-level kernel ([[PrefixSum.bucketedRunningSum]] — 64
  *      bucket-local cumsums in parallel, one rows=buckets offsets
  *      window; no task ever scans the corpus end-to-end).
  *   3. shard = floor(start_offset · nShards / total_tokens) — each
  *      shard owns one CONTIGUOUS total/nShards-token slice of the
  *      interleaved stream (a prefix-sum bin, not round-robin), so
  *      per-shard token sums deviate from the ideal total/nShards by
  *      less than one maximal unit: the greedy token-balanced
  *      assignment, closed-form. The total rides a 1-row broadcast
  *      (the scalar-cross doctrine), never a second corpus window.
  *
  * Within a shard the write order is `cum_tokens` — the plan IS the
  * ordered assignment, so N writers can each stream their slice
  * independently and reproducibly.
  *
  * Scale: one corpus shuffle (the prefix-sum bucketing), one 1-row
  * broadcast, map-only arithmetic after. Overflow-safe by
  * construction: `start · nShards` stays under int64 for any corpus
  * below ~9·10¹⁸/nShards tokens (at 2.5·10¹³ tokens — 100 TB of text —
  * and 1,024 shards the product is ~2.6·10¹⁶).
  */
object ShardExport {

  /** The per-unit shard assignment: input columns plus
    * `cum_tokens` (global running token count in the interleave
    * order, inclusive) and `shard` (0-based). `idCol` must be unique;
    * `tokCol` the unit's token count (≥ 0). */
  def shardPlan(units: DataFrame, idCol: String, tokCol: String,
      nShards: Int, buckets: Int = 64): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = PortableHash.hash60(
      concat(col(idCol).cast("string"), lit("|shard")))
    val base = units
      .withColumn("__bkt", h % buckets)
      .withColumn("__ord", h)
    val cum = PrefixSum.bucketedRunningSum(base, Seq.empty, "__bkt",
      Seq(col("__ord"), col(idCol)), tokCol, "cum_tokens")
    // the corpus-total scalar: summed from the SAME per-bucket
    // aggregation the prefix-sum kernel builds its offsets from —
    // byte-identical subtree, so the planner reuses that exchange
    // (ReusedExchange) instead of paying a third corpus scan for a
    // 1-row total. greatest(·,1) guards the degenerate all-empty
    // corpus.
    val total = base
      .groupBy(col("__bkt"))
      .agg(sum(col(tokCol)).as("__bkt_sum"))
      .agg(greatest(sum(col("__bkt_sum")), lit(1L)).cast("long")
        .as("__total"))
    cum
      .crossJoin(broadcast(total))
      .withColumn("shard",
        expr(s"((cum_tokens - $tokCol) * $nShards) div __total")
          .cast("long"))
      .drop("__bkt", "__ord", "__total")
  }

  /** The per-shard audit manifest a run ships with: row counts, token
    * sums, source mix width, and the shard's [start_pos, end_pos)
    * token-offset slice of the interleaved stream. `plan` is
    * [[shardPlan]] output carrying a `source` column. */
  def shardManifest(plan: DataFrame, tokCol: String): DataFrame =
    plan
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_units"),
        sum(col(tokCol)).cast("long").as("n_tokens"),
        countDistinct(col("source")).as("n_sources"),
        min(col("cum_tokens") - col(tokCol)).cast("long").as("start_pos"),
        max(col("cum_tokens")).cast("long").as("end_pos"))
}
