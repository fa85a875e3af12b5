package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-level prefix sum — the reusable kernel behind every
  * running-total operator in the engine (token-budget admission, chunk
  * packing, systematic PPS sampling; future operators should call this
  * instead of re-deriving the shape).
  *
  * A running sum over a deterministic global order is the textbook case
  * where a naive plan dies at scale: `SUM(...) OVER (ORDER BY ...)` with
  * no partition key collapses the whole table into ONE task. The kernel
  * decomposes it:
  *
  *   1. rows carry a hash bucket (`bktCol`, caller-derived from the same
  *      hash that defines the traversal order, so bucket ranges are
  *      contiguous in that order);
  *   2. per-(partition, bucket) LOCAL cumsums run in parallel — each a
  *      bounded slice, never a whole partition;
  *   3. per-bucket totals aggregate to a rows=buckets frame whose own
  *      running sum (the only single-task window — `buckets` rows by
  *      construction) yields each bucket's starting offset;
  *   4. offsets broadcast back and local + offset = global cumsum. No
  *      task ever scans a partition end-to-end, nothing shuffles twice.
  *
  * Correctness is oracle-proven by the callers: their DuckDB oracles
  * compute the same totals as ONE flat sequential window and the rows
  * hash-match — the decomposition is exactly the sequential semantics.
  *
  * `orderCols` must be a total order within each (partition, bucket) —
  * include a unique id tiebreaker — and `(bktCol, orderCols)` must sort
  * identically to the intended global order (true when the bucket is
  * `hash % buckets` and the first order column is that same hash).
  */
object PrefixSum {

  /** Appends `cumCol` = running sum of `valueCol` over the global order
    * `(bktCol, orderCols)` within each `partCols` group (empty = one
    * global stream). `df` must already carry `bktCol`. */
  def bucketedRunningSum(df: DataFrame, partCols: Seq[String],
      bktCol: String, orderCols: Seq[Column], valueCol: String,
      cumCol: String): DataFrame = {
    val partBy = partCols.map(col)
    val inBucket = Window.partitionBy(partBy :+ col(bktCol): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bucket offsets: rows = buckets (per partition) — the single-task
    // window here is `buckets` rows by construction, not data-sized.
    // Spark's "WindowExec: No Partition Defined" warning on this node
    // is expected and safe: it fires on row COUNT it can't see, and
    // the count is the fixed bucket fan-out, never the corpus.
    val acrossBuckets = (if (partBy.isEmpty) Window.orderBy(col(bktCol))
      else Window.partitionBy(partBy: _*).orderBy(col(bktCol)))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(partBy :+ col(bktCol): _*)
      .agg(sum(col(valueCol)).as("__bkt_sum"))
      .withColumn("__offset",
        coalesce(sum(col("__bkt_sum")).over(acrossBuckets), lit(0L)))
      .select(partBy :+ col(bktCol) :+ col("__offset"): _*)
    df.withColumn("__local_cum", sum(col(valueCol)).over(inBucket))
      .join(broadcast(offsets), partCols :+ bktCol)
      .withColumn(cumCol,
        (col("__local_cum") + col("__offset")).cast("long"))
      .drop("__local_cum", "__offset")
  }
}
