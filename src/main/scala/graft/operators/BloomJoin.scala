package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the shuffle-elimination pattern for
  * large fact-to-filtered-dim joins at 100 TB scale.
  *
  * A selective predicate on the build side usually survives to the join
  * as a *post-shuffle* filter: every fact row is still shuffled, then
  * most are dropped. A Bloom sketch of the surviving build keys, applied
  * as a scan-side filter on the probe, drops non-matching fact rows
  * BEFORE the exchange — at a 1% match rate that is a ~100× reduction in
  * shuffled bytes for a few KB of broadcast sketch. False positives pass
  * the pre-filter and are eliminated by the exact join that follows, so
  * the composed result is exactly the plain join's (the oracle runs the
  * plain join).
  *
  * Built on Spark's own sketch machinery ([[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]], the expressions behind
  * `spark.sql.optimizer.runtime.bloomFilter.*` runtime filters) so the
  * probe-side test participates in whole-stage codegen — no UDF.
  */
object BloomJoin {

  /** Bloom sketch of `xxhash64(key)` over the build side, materialized on
    * the driver. This is a bounded-size SKETCH collect (numBits/8 bytes +
    * header, KBs), not a data collect — the same materialization Spark's
    * runtime-filter injection performs when it plans a bloom pushdown.
    * Returns null on an empty build side (the aggregate's own semantics);
    * [[mightContain]] then evaluates to null, which a `filter` treats as
    * drop-all — exactly right for an inner join against an empty build. */
  def keySketch(build: DataFrame, key: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      CatalystBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.agg(CatalystBridge.column(agg).as("sketch"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen-friendly membership test of `key` against a driver-built
    * sketch (embedded as a binary literal, shipped with the task binary
    * like a broadcast). */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    CatalystBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      CatalystBridge.expression(xxhash64(key))))

  /** Inner equi-join of `probe` to `build` with a Bloom pre-filter on the
    * probe side. Result is exactly `probe JOIN build` — false positives
    * are removed by the join itself. */
  def prefilteredJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val sketch = keySketch(build, col(buildKey), expectedItems, numBits)
    probe.filter(mightContain(sketch, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }
}
