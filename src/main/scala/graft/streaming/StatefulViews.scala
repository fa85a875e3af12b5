package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A2 content-stats as TTL'd streaming state (`transformWithState`).
  *
  * The reference's Redis hash `content_stats:<id>` carries a 1-hour
  * `EXPIRE` refreshed on every write (`RedisSink.java:190-207`) — state
  * that dies TTL after the key's last update. Watermark-based eviction
  * can't express that (it is event-time, reference TTLs are
  * processing-time, SURVEY.md §2.7 T3); Spark 4's `transformWithState`
  * value state with [[TTLConfig]] expresses it exactly: per-key state,
  * refreshed on write, expired by the store after `ttl` of silence —
  * the direct analogue of the Redis key-space, in exactly-once state.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
object StatefulViews {

  /** Input row: the A2-relevant slice of the enriched stream. */
  case class StatIn(content_id: String, engagement_pct: Double,
      content_type: String, content_title: String, event_type: String,
      device: String, event_ts: Timestamp, event_id: Long)

  /** Output row: the six last-value fields + running count (A2). */
  case class StatOut(content_id: String, latest_engagement: Double,
      content_type: String, content_title: String, event_type: String,
      device: String, last_updated: Timestamp, total_events: Long)

  class ContentStatsProcessor(ttl: Duration)
      extends StatefulProcessor[String, StatIn, StatOut] {

    @transient private var state: ValueState[StatOut] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[StatOut]("stats",
        Encoders.product[StatOut], TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[StatIn],
        timerValues: TimerValues): Iterator[StatOut] = {
      // deterministic within-batch order: (event_ts, event_id)
      val sorted = rows.toSeq.sortBy(r => (r.event_ts.getTime, r.event_id))
      if (sorted.isEmpty) Iterator.empty
      else {
        val prev = if (state.exists()) Option(state.get()) else None
        val base = prev.getOrElse(
          StatOut(key, 0d, null, null, null, null, new Timestamp(0), 0L))
        val last = sorted.last
        val out = StatOut(key, last.engagement_pct, last.content_type,
          last.content_title, last.event_type, last.device, last.event_ts,
          base.total_events + sorted.size)
        state.update(out) // refreshes the TTL — Redis EXPIRE-on-write
        Iterator.single(out)
      }
    }
  }

  /** The streaming A2 view with per-key TTL. `enriched` must carry the
    * P6-valid rows only (gate upstream, as the reference does). */
  def contentStatsTtl(enriched: Dataset[StatIn], ttl: Duration): Dataset[StatOut] = {
    val spark = enriched.sparkSession
    import spark.implicits._
    enriched.groupByKey(_.content_id)
      .transformWithState(new ContentStatsProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
