package graft.functions

import org.apache.spark.sql.{functions, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}

/** Typed top-K accumulator (the UDAF extension surface).
  *
  * Batch plans don't need this — `orderBy(desc).limit(k)` already plans
  * `TakeOrderedAndProject`. Its purpose is incremental maintenance
  * (SURVEY.md §4): in streaming update mode a sort-limit must recompute
  * from all state every batch, while an `Aggregator` buffer of at most k
  * entries merges partial top-Ks associatively — map-side partials at
  * scale, bounded state in a stream.
  *
  * Determinism: ordering is (score DESC, member ASC) everywhere — same
  * total order as the sort-limit leaderboard path (pinned equal by
  * TopKAggregatorSpec).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(String, Double), Seq[(String, Double)], Seq[(String, Double)]] {

  private def ord: Ordering[(String, Double)] =
    Ordering.by[(String, Double), (Double, String)] { case (m, s) => (-s, m) }

  override def zero: Seq[(String, Double)] = Seq.empty

  override def reduce(buf: Seq[(String, Double)], row: (String, Double)): Seq[(String, Double)] =
    // bounded insertion into the (always-sorted) buffer: O(1) reject of
    // rows that sort at/after a full buffer's minimum — the common case
    // once the buffer fills — and O(k) positional insert otherwise,
    // instead of a full O(k log k) re-sort per input row
    if (buf.lengthCompare(k) >= 0 && ord.gteq(row, buf.last)) buf
    else {
      val (before, after) = buf.span(e => ord.lt(e, row))
      (before ++ (row +: after)).take(k)
    }

  override def merge(a: Seq[(String, Double)], b: Seq[(String, Double)]): Seq[(String, Double)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(String, Double)]): Seq[(String, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Double)]] =
    ExpressionEncoder[Seq[(String, Double)]]()
  override def outputEncoder: Encoder[Seq[(String, Double)]] =
    ExpressionEncoder[Seq[(String, Double)]]()
}

object TopKAggregator {
  /** UDAF form: `df.agg(topK(100)(col("member"), col("score")))` —
    * usable in any untyped aggregation, incl. streaming update mode. */
  def topK(k: Int): UserDefinedFunction = functions.udaf(new TopKAggregator(k))
}
