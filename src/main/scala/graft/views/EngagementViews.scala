package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.enrich.Enrichment

/** The four continuously-maintained KV views of the reference's Redis
  * sink (`RedisSink.java:174-231`), expressed as declarative aggregations
  * over the enriched stream (SURVEY.md §2.4).
  *
  * "Latest per key" in the reference means Flink arrival order
  * (last-write-wins on the Redis key). Spark has no row order, so every
  * "latest" here is made deterministic with an explicit total order
  * `(event_ts, event_id)` via `max_by(value, struct(event_ts, event_id))`
  * (SURVEY.md §7.4.2) — a single-pass hash aggregation with map-side
  * partial combine, no window-sort shuffle, which is what survives a
  * 100 TB fact table: one shuffle on the group key, pre-aggregated.
  *
  * All views require the P6 validity gate (the reference applies it inside
  * the Redis sink, before every view write — `RedisSink.java:137-140`).
  */
object EngagementViews {

  private def latest(value: Column): Column =
    max_by(value, struct(col("event_ts"), col("event_id")))

  /** The leaderboard member key, reference-exact: `String.format` in the
    * reference renders a null dimension field as the literal "null"
    * (`RedisSink.updateTopEngagement`), where bare concat_ws would skip
    * it and silently merge distinct members. */
  def member: Column =
    concat_ws(":", coalesce(col("content_id"), lit("null")),
      coalesce(col("content_type"), lit("null")),
      coalesce(col("content_title"), lit("null")))

  /** P6 gate applied by the reference before any Redis write. */
  def validOnly(enriched: DataFrame): DataFrame =
    enriched.filter(Enrichment.hasValidEngagement(col("engagement_pct")))

  /** A1 — global top-K leaderboard (`top_engagement:10min`,
    * `RedisSink.java:174-188`): member = `contentId:type:title` (opaque
    * concat — titles may contain ':', never split it back), score = the
    * member's *latest* engagement_pct, keep the top `k` (reference: 100).
    * Deterministic tie-break on member. Plans as hash-agg +
    * `TakeOrderedAndProject` — no full sort at any scale.
    */
  def leaderboard(enriched: DataFrame, k: Int = 100): DataFrame =
    validOnly(enriched)
      .withColumn("member", member)
      .groupBy(col("member"))
      .agg(latest(col("engagement_pct")).as("score"))
      .orderBy(col("score").desc, col("member").asc)
      .limit(k)

  /** A2 — per-content stats hash (`content_stats:<id>`,
    * `RedisSink.java:190-207`): six last-value fields plus an event count;
    * the count covers only P6-valid events (the gate precedes the HINCRBY).
    */
  def contentStats(enriched: DataFrame): DataFrame =
    validOnly(enriched)
      .groupBy(col("content_id"))
      .agg(
        latest(col("engagement_pct")).as("latest_engagement"),
        latest(col("content_type")).as("content_type"),
        latest(col("content_title")).as("content_title"),
        max(struct(col("event_ts"), col("event_id"))).getField("event_ts").as("last_updated"),
        latest(col("event_type")).as("event_type"),
        latest(col("device")).as("device"),
        count(lit(1)).as("total_events"))

  /** A3 — per (user, content) latest engagement
    * (`user_engagement:<uid>:<cid>`, `RedisSink.java:209-219`). */
  def userContentLatest(enriched: DataFrame): DataFrame =
    validOnly(enriched)
      .groupBy(col("user_id"), col("content_id"))
      .agg(
        latest(col("engagement_pct")).as("engagement_pct"),
        max(struct(col("event_ts"), col("event_id"))).getField("event_ts").as("last_updated"))

  /** A4 — minute-bucketed event-time window set
    * (`engagement_window:yyyy-MM-dd:HH:mm`, `RedisSink.java:221-231`).
    * Each event ZADDs member `contentId:pct` with score pct into its
    * event-time minute bucket; zset member dedup makes the view exactly
    * the *distinct* (minute, content_id, pct) triples.
    */
  def minuteWindows(enriched: DataFrame): DataFrame =
    validOnly(enriched)
      .select(
        date_trunc("minute", col("event_ts")).as("window_minute"),
        col("content_id"),
        col("engagement_pct"))
      .distinct()

  /** TTL-at-read semantics (`EXPIRE` in the reference — 600 s for A1/A4,
    * 3600 s for A2, 1800 s for A3): filter to events within `ttlSeconds`
    * of `now` before computing a view. At scale this predicate is pushed
    * into the parquet/Kafka scan.
    */
  def withinTtl(tsCol: Column, ttlSeconds: Long, now: Column): Column =
    tsCol >= (now - expr(s"INTERVAL $ttlSeconds SECONDS"))
}
