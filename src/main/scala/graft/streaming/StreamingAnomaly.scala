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
  * values (≤ 24 longs) — bounded regardless of stream volume. The test
  * is the batch operator's division-free integer cross-multiplication:
  * with S = Σx, Q = Σx² over the frame ending at the current row,
  * |x − S/n| > 2σ  ⟺  (nx − S)² > 4(nQ − S²) — exact int64 arithmetic
  * (values are frame-bounded), so streaming and batch flag identical
  * rows on in-order data (pinned by spec). Out-of-order arrivals within
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
                val s = xs.sum
                val q = xs.map(v => v * v).sum
                val d = n * o.x - s
                if (n >= minN && d * d > 4 * (n * q - s * s))
                  Some(Outlier(key, o.event_id, o.x, n, s, q))
                else None
              }
            state.update(RingState(xs, lastTs))
            state.setTimeoutTimestamp(math.max(lastTs + ttlMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
