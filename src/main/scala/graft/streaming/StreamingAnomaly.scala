package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `analytics_rolling_zscore` operator:
  * per-key trailing-frame 2-sigma anomaly detection with
  * `flatMapGroupsWithState`.
  *
  * State per key is the ring buffer of the last `frame − 1` observed
  * values (≤ 23 longs for the default frame of 24) — the next row's
  * frame is those plus the row itself, so nothing more is needed and
  * state stays bounded regardless of stream volume. The test is the
  * batch operator's division-free integer cross-multiplication: with
  * S = Σx, Q = Σx² over the frame ending at the current row,
  * |x − S/n| > 2σ  ⟺  (nx − S)² > 4(nQ − S²) — exact int64 arithmetic
  * while every |x| in the frame stays under the magnitude bound
  * (≈ `sqrt(Long.Max / 8) / frame`), the regime where streaming and
  * batch flag identical rows on in-order data (pinned by spec). Values
  * above the bound promote THIS operator's test to BigInt — still the
  * exact answer; note the batch twin (`analytics_rolling_zscore`) is a
  * raw-SQL window whose contract is the in-bound regime (its int64
  * would wrap there, and DuckDB would raise), so past the bound the
  * streaming side is the reliable one, not a bit-twin of the batch
  * query. Out-of-order arrivals within
  * a micro-batch are re-sorted by event time; later-batch stragglers
  * see the frame as of arrival — the same horizon trade
  * [[StreamingFunnel]] makes.
  *
  * An event-time TTL bounds key cardinality for high-cardinality keys,
  * anchored to the key's own latest timestamp (watermark-based timeouts
  * would expire fresh state on the first batch — see StreamingFunnel).
  */
object StreamingAnomaly {

  case class Obs(key: String, event_id: Long, ts: Timestamp, x: Long)

  case class RingState(xs: Seq[Long], lastTs: Long)

  case class Outlier(key: String, event_id: Long, x: Long,
      n: Int, s: Long, q: Long)

  /** `events` must have columns (key: string, event_id: long,
    * ts: timestamp, x: long). Emits only rows whose frame (the
    * preceding `frame − 1` values plus the row itself) has at least
    * `minN` observations and fails the 2-sigma test. */
  def rollingZScoreStream(events: DataFrame, frame: Int = 24,
      minN: Int = 12, watermarkDelay: String = "1 hour",
      ttlMs: Long = 2L * 3600 * 1000): Dataset[Outlier] = {
    val spark = events.sparkSession
    import spark.implicits._
    // Largest |x| for which every intermediate of the int64 test is
    // overflow-safe: |nx − S| ≤ 2·frame·maxAbs and |4(nQ − S²)| ≤
    // 8·frame²·maxAbs², so maxAbs² < Long.Max / (8·frame²) keeps both
    // sides (and their squares) inside int64. Frames above the bound
    // fall back to BigInt — identical answer, no silent wrap.
    val safeAbs = math.sqrt(Long.MaxValue.toDouble / (8.0 * frame * frame)).toLong / 2
    events.select(col("key"), col("event_id").cast("long"),
        col("ts"), col("x").cast("long"))
      .withWatermark("ts", watermarkDelay)
      .as[Obs]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[Obs], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var xs = state.getOption.map(_.xs.toVector).getOrElse(Vector.empty)
            var lastTs = state.getOption.map(_.lastTs).getOrElse(0L)
            val out = batch.toSeq.sortBy(o => (o.ts.getTime, o.event_id))
              .flatMap { o =>
                xs = (xs :+ o.x).takeRight(frame)
                lastTs = math.max(lastTs, o.ts.getTime)
                val n = xs.length
                if (n < minN) None
                else if (xs.forall(v => v > -safeAbs && v < safeAbs)) {
                  val s = xs.sum
                  val q = xs.map(v => v * v).sum
                  val d = n * o.x - s
                  if (d * d > 4 * (n * q - s * s))
                    Some(Outlier(key, o.event_id, o.x, n, s, q))
                  else None
                } else {
                  // magnitude past the int64-safe bound: same test in
                  // BigInt — the flag stays exact; the reported S/Q
                  // moments saturate rather than wrap (they no longer
                  // fit the schema's long, and a clamped extreme reads
                  // as what it is, unlike a wrapped sign flip)
                  def sat(b: BigInt): Long =
                    if (b > Long.MaxValue) Long.MaxValue
                    else if (b < Long.MinValue) Long.MinValue else b.toLong
                  val s = xs.foldLeft(BigInt(0))(_ + _)
                  val q = xs.foldLeft(BigInt(0))((acc, v) => acc + BigInt(v) * v)
                  val d = BigInt(n) * o.x - s
                  if (d * d > 4 * (BigInt(n) * q - s * s))
                    Some(Outlier(key, o.event_id, o.x, n, sat(s), sat(q)))
                  else None
                }
              }
            // the next row needs only the previous frame−1 values (it
            // contributes the frame'th itself) — store exactly that, so
            // the documented per-key state bound holds
            state.update(RingState(xs.takeRight(frame - 1), lastTs))
            state.setTimeoutTimestamp(math.max(lastTs + ttlMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
