package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch [[graft.plans.FunnelMatch]] operator:
  * per-key sequential-pattern state maintained with
  * `flatMapGroupsWithState`.
  *
  * State per key is O(steps) — the index of the next step awaited plus
  * the matched timestamps — NOT the event history, so state size is
  * independent of stream volume; an event-time TTL (timeout on group
  * state) bounds key cardinality. Emission: one row per key each time
  * it advances at least one step (update semantics — a downstream KV
  * sink upserts the latest funnel position).
  *
  * Matching semantics are the batch operator's: step 0 at the key's
  * earliest step-0 event, step i at the first event strictly later than
  * the step-(i−1) match — with the streaming caveat that out-of-order
  * arrivals WITHIN the same micro-batch are re-sorted by event time,
  * while an event arriving in a later batch than a successor it should
  * have preceded is a late-data drop (the same horizon trade every
  * watermark state operator makes).
  */
object StreamingFunnel {

  case class FunnelEvent(key: String, step: Int, ts: Timestamp)

  case class FunnelState(matchedTs: Seq[Long])

  case class FunnelProgress(key: String, steps_done: Int, last_ts: Timestamp)

  /** `events` must have columns (key: string, step: int, ts: timestamp)
    * where `step` is the 0-based funnel stage the event satisfies (< 0
    * for events that satisfy none). State expires `ttlMs` past the
    * event-time watermark — an EVENT-time timeout, because a
    * processing-time timeout schedules wall-clock housekeeping batches
    * that never let a drained test (or a quiet topic) settle. */
  def funnelStream(events: DataFrame, nSteps: Int,
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 2L * 3600 * 1000): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("key"), col("step").cast("int"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var matched = state.getOption.map(_.matchedTs.toArray)
              .getOrElse(Array.empty[Long])
            val before = matched.length
            // within-batch re-sort by event time restores intra-batch order
            batch.toSeq.sortBy(e => (e.ts.getTime, e.step)).foreach { e =>
              val i = matched.length
              if (i < nSteps && e.step == i &&
                  (i == 0 || e.ts.getTime > matched(i - 1)))
                matched = matched :+ e.ts.getTime
            }
            if (matched.length > before) {
              state.update(FunnelState(matched.toSeq))
              // TTL anchored to the key's OWN event time, not the
              // watermark: on the first batch the watermark is still 0
              // (epoch), so watermark+ttl would already be expired the
              // moment real data advances it — the state would silently
              // die between batches. Guard: Spark requires the timeout
              // to be strictly later than the current watermark.
              state.setTimeoutTimestamp(math.max(matched.last + ttlMs,
                state.getCurrentWatermarkMs() + 1))
              Iterator.single(FunnelProgress(key, matched.length,
                new Timestamp(matched.last)))
            } else Iterator.empty
          }
      }
  }
}
