package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.operators.BloomJoin

/** The bloom pre-filter must never change the join result (false
  * positives are culled by the exact join; false negatives are
  * impossible), and the sketch must actually prune the probe side. */
class BloomJoinSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("prefiltered join == plain join, and the sketch prunes the probe") {
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_quantity"))

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val bloomed = BloomJoin.prefilteredJoin(li, ord, "l_orderkey", "o_orderkey",
      expectedItems = 1L << 14, numBits = 1L << 18)
    bloomed.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(bloomed).count() shouldBe 0

    // pruning: the pre-filter keeps all true matches but drops most
    // non-matching probe rows (fp rate at these sizes is << 1)
    val sketch = BloomJoin.keySketch(ord, col("o_orderkey"), 1L << 14, 1L << 18)
    val kept = li.filter(BloomJoin.mightContain(sketch, col("l_orderkey"))).count()
    val matches = plain.count()
    assert(kept >= li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_semi").count())
    assert(kept < li.count(), "sketch must prune some probe rows")
    withClue(s"kept=$kept matches=$matches") {
      assert(kept <= li.count() / 2, "sketch should prune the majority at this selectivity")
    }
  }

  test("empty build side drops every probe row (null sketch semantics)") {
    val ord = Tables.orders(spark, d).filter(lit(false))
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"))
    val sketch = BloomJoin.keySketch(ord, col("o_orderkey"), 1L << 10, 1L << 13)
    assert(sketch == null)
    li.filter(BloomJoin.mightContain(sketch, col("l_orderkey"))).count() shouldBe 0
  }
}
