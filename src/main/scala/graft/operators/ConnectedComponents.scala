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
    // would evaluate the (unpersisted) upstream twice inside the same job.
    // A self-loop per node is appended so each round's neighbor-minimum
    // aggregation covers the node's OWN label too — that folds what would
    // be a separate labels⋈neighbor-min join into the aggregation itself
    // (one fewer exchange per round), and the self-loop row doubles as
    // the carrier of the node's previous label for convergence checking.
    val sym = edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
    val sym0 = sym.persist()
    // State-proportional shuffle width for the iterative section. The
    // edge/label state after candidate generation is orders of magnitude
    // smaller than the corpus that produced it, so inheriting the
    // corpus-wide spark.sql.shuffle.partitions burns a fixed per-round
    // task-scheduling cost on mostly-empty partitions (measured 3-4x the
    // actual work at small |V|). Size everything from the measured edge
    // count instead — ~2M directed edges (≈32 MB) per partition, never
    // wider than the session default: a billion-edge graph still fans
    // out fully, a thousand-edge graph runs its rounds in one task.
    // (The count also forces sym0, so the upstream candidate pipeline
    // runs exactly once.)
    val spark = edges.sparkSession
    val confPartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val statePartitions = math.max(1L,
      math.min(confPartitions.toLong, sym0.count() / 2000000L + 1)).toInt
    // narrow the session's shuffle width for init + rounds, restored in
    // the finally below. Session-scoped by nature: callers running
    // unrelated queries on the same session CONCURRENTLY with run()
    // would see the narrowed width — acceptable for a blocking batch
    // operator.
    val prevConf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    var changed = 1L
    var i = 0
    var labels: DataFrame = null
    val symSelf = sym0
      .union(sym0.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst")))
      // pin the static join side at the round width ONCE; every round's
      // join then only re-shuffles the (small) label state
      .repartition(statePartitions, col("dst"))
      .persist()
    try {
    // localCheckpoint (not bare persist) each round: iterative DataFrame
    // algorithms grow their logical plan multiplicatively per iteration
    // — without truncating the lineage, Catalyst analysis itself blows
    // the heap long before the data does. Checkpointing also pins the
    // groupBy's hash partitioning on `node`, which the next round's
    // label join reuses instead of re-exchanging.
    labels = symSelf.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    sym0.unpersist()
    while (changed > 0 && i < maxIter) {
      // candidate label: min over neighbors' labels ∪ own label (via the
      // self-loop); the self-loop row also carries the previous label out
      val hop = symSelf
        .join(labels, col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(min(col("label")).as("l1"),
          max(when(col("dst") === col("src"), col("label"))).as("old"))
        .withColumnRenamed("src", "node")
      // pointer jumping (path compression): also adopt the label OF the
      // current label — remaining distance to the component minimum
      // halves each round, so rounds are O(log diameter) instead of
      // O(diameter) on chain-shaped components. The fixpoint is
      // unchanged: labels only ever decrease toward the same minimum.
      val step = hop.as("s")
        .join(hop.select(col("node").as("jn"), col("l1").as("jl")).as("j"),
          col("s.l1") === col("j.jn"), "left")
        .select(col("s.node").as("node"), col("s.old").as("old"),
          least(col("s.l1"), coalesce(col("j.jl"), col("s.l1")))
            .as("label"))
        .localCheckpoint(true)
      changed = step.filter(col("label") =!= col("old")).count()
      labels = step.select(col("node"), col("label"))
      i += 1
    }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevConf)
    symSelf.unpersist()
    // Unconverged labels are wrong clusters — never return them silently.
    // Pointer jumping makes this O(log diameter), so hitting maxIter means
    // the caller's bound is badly undersized for the graph, not bad luck.
    if (changed > 0) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds " +
        s"($changed labels still changing); raise maxIter")
    labels
  }
}
