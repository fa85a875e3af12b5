package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over an edge list, in integer fixed-point — the
  * authority-ranking companion to [[ConnectedComponents]] for graphs
  * materialized by the engine (e.g. the user→content engagement graph
  * the reference pipeline produces, or near-dup candidate graphs).
  *
  * Arithmetic doctrine: ranks are micro-units (1,000,000 = rank 1.0) and
  * every step is `floor` of a single IEEE op on exact integers — so the
  * result is deterministic across partitionings AND reproducible by the
  * DuckDB oracle bit-for-bit (float summation order never matters; the
  * sums are integer sums).
  *
  * Scale shape per iteration: one shuffle to join ranks onto edges (both
  * sides hash-partitioned by `src` — the degree join reuses the same
  * partitioning) and one hash aggregation by `dst` with map-side
  * partials. State per round is one (node, rank) row per node; the edge
  * list is computed once, persisted, and reused every round.
  * `localCheckpoint` per round caps the logical-plan growth that OOMs
  * Catalyst on iterative DataFrame algorithms (same doctrine as
  * [[ConnectedComponents.run]]).
  */
object Graph {

  val RankOne = 1000000L // fixed-point scale: micro-rank units
  val Damping = 0.85
  val BaseFp: Long = math.round((1 - Damping) * RankOne) // 150,000

  /** One power-iteration step: every node's next rank from the current
    * `ranks` (node, rank_fp). Nodes with no in-edges keep the base term.
    * Dangling-source mass is dropped (not redistributed) — pinned,
    * documented semantics, identical in the oracle. */
  def pagerankStep(edges: DataFrame, ranks: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val share = edges
      .join(deg, "src")
      .join(ranks.withColumnRenamed("node", "src"), "src")
      // exact operands, one IEEE division, floor: portable bit-for-bit
      .select(col("dst"),
        floor(col("rank_fp").cast("double") / col("deg")).cast("long").as("c"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val sums = share.groupBy(col("dst").as("node"))
      .agg(sum(col("c")).as("in_mass"))
    nodes.join(sums, Seq("node"), "left")
      .select(col("node"),
        (lit(BaseFp) + floor(lit(Damping) * coalesce(col("in_mass"), lit(0L))))
          .cast("long").as("rank_fp"))
  }

  /** `iters` full power-iteration rounds from a uniform start. */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var ranks = nodes.withColumn("rank_fp", lit(RankOne)).localCheckpoint(true)
    for (_ <- 1 to iters)
      ranks = pagerankStep(e, ranks).localCheckpoint(true)
    e.unpersist()
    ranks
  }
}
