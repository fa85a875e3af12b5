package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS into duplicate CLUSTERS so a curation
  * pipeline can elect one keeper per group (transitive closure: if
  * a≈b and b≈c, all three are one cluster even when a≉c directly).
  *
  * Algorithm: HashMin label propagation. Every node starts labeled with
  * its own id; each round, a node adopts the minimum label among itself
  * and its neighbors; converged when no label changes. Each round is
  * one equi-join + one hash aggregation — shuffles on node ids, state
  * is one (node, label) row per node — and the round count is the graph
  * diameter, which for near-dup clusters is small (they are dense).
  * This is the shape that survives 100 TB: no driver-side graph, the
  * only driver interaction is the scalar convergence count per round.
  *
  * The fixpoint (label = minimum node id reachable) is deterministic
  * regardless of partitioning or iteration interleaving, so an oracle
  * can recompute it by transitive closure.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges (a, b).
    * @return (node, label) — label is the minimum node id in the
    *         component; only nodes that appear in an edge are returned.
    */
  def run(edges: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIter: Int = 30): DataFrame = {
    // the edge list is re-joined every round — pin it so an expensive
    // upstream (e.g. a MinHash candidate pipeline) runs once. Both edge
    // directions come from ONE pass via explode: a union of two selects
    // would evaluate the (unpersisted) upstream twice inside the same job
    val sym = edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .persist()
    // localCheckpoint (not bare persist) each round: iterative DataFrame
    // algorithms grow their logical plan multiplicatively per iteration
    // — without truncating the lineage, Catalyst analysis itself blows
    // the heap long before the data does
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // each node's candidate label: min over its neighbors' labels
      val fromNeighbors = sym
        .join(labels, col("dst") === col("node"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("nb_label"))
      val hop = labels.as("l")
        .join(fromNeighbors.as("n"), Seq("node"), "left")
        .select(col("node"), col("l.label").as("old"),
          least(col("l.label"), coalesce(col("n.nb_label"), col("l.label")))
            .as("label"))
      // pointer jumping (path compression): also adopt the label OF the
      // current label — remaining distance to the component minimum
      // halves each round, so rounds are O(log diameter) instead of
      // O(diameter) on chain-shaped components. The fixpoint is
      // unchanged: labels only ever decrease toward the same minimum.
      // `old` rides along so convergence is one filter-count over the
      // checkpointed round, not a re-join.
      val step = hop.as("s")
        .join(hop.select(col("node").as("jn"), col("label").as("jl")).as("j"),
          col("s.label") === col("j.jn"), "left")
        .select(col("s.node").as("node"), col("s.old").as("old"),
          least(col("s.label"), coalesce(col("j.jl"), col("s.label")))
            .as("label"))
        .localCheckpoint(true)
      changed = step.filter(col("label") =!= col("old")).count()
      labels = step.select(col("node"), col("label"))
      i += 1
    }
    sym.unpersist()
    // Unconverged labels are wrong clusters — never return them silently.
    // Pointer jumping makes this O(log diameter), so hitting maxIter means
    // the caller's bound is badly undersized for the graph, not bad luck.
    if (changed > 0) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds " +
        s"($changed labels still changing); raise maxIter")
    labels
  }
}
