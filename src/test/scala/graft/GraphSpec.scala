package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank fixed-point semantics on hand-checkable graphs. Expected
  * values mirror the operator's exact arithmetic (floor of one IEEE
  * multiply/divide on integer operands) — the same ops the DuckDB oracle
  * of graph_pagerank_step runs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def step(x: Long): Long =
    Graph.BaseFp + math.floor(Graph.Damping * x).toLong

  test("one step on a 3-cycle with a chord matches hand arithmetic") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ranks = Graph.pagerank(edges, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deg(1)=2, deg(2)=1, deg(3)=1; uniform start 1e6
    ranks(1L) shouldBe step(1000000L)           // from 3
    ranks(2L) shouldBe step(500000L)            // half of 1
    ranks(3L) shouldBe step(500000L + 1000000L) // half of 1 + all of 2
  }

  test("dangling sink keeps receiving, contributes nothing (pinned)") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val ranks = Graph.pagerank(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ranks(1L) shouldBe Graph.BaseFp // no in-edges after round 1
    ranks(2L) shouldBe step(Graph.BaseFp) // round 2: receives 1's base rank
  }

  test("power iteration contracts: per-round L1 movement falls monotonically") {
    // damping bounds the contraction at ~0.85 per round; the share/sum
    // floors add at most ±1 per node of noise, so each round's total
    // delta must drop below the previous one plus an n_nodes allowance —
    // and over the full run the movement must genuinely shrink
    val rows = SparkEntry.queries("graph_pagerank_converge")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("iter"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("total_delta")))
      .sortBy(_._1)
    rows.map(_._1) shouldBe Array(1L, 2L, 3L)
    val slack = rows.map(_._2).max
    withClue(s"per-round deltas ${rows.mkString(", ")}: ") {
      rows.sliding(2).foreach { case Array((_, _, a), (_, _, b)) =>
        b should be <= (a + slack)
      }
      rows.last._3 should be < rows.head._3 // strict end-to-end contraction
    }
    // and the trained ranks are exactly the step kernel iterated: the
    // final convergence state must match graph_pagerank_train's output size
    val trained = SparkEntry.queries("graph_pagerank_train")(
      spark, "/root/testdata/sf0.001")
    trained.count() shouldBe rows.head._2
  }

  test("iteration is deterministic and total (every node ranked)") {
    val edges = Seq.tabulate(200)(i => (i.toLong % 23, (i * 7L) % 31))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val a = Graph.pagerank(edges, 3).orderBy("node").collect().toSeq
    val b = Graph.pagerank(edges, 3).orderBy("node").collect().toSeq
    a shouldBe b
    val nNodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst"))).distinct().count()
    a.size.toLong shouldBe nNodes
    all(a.map(_.getLong(1))) should be >= Graph.BaseFp
  }
}
