package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

/** The semantic heart of the reference pipeline: the dimension join (J1)
  * and the two derived engagement metrics (P3/P4), plus the gating
  * predicates (P6/P7).
  *
  * Design (SURVEY.md §2.3): the reference does a keyed-state point lookup
  * per event (`EngagementStreamingJob.java:308-349`) — enrich on match,
  * drop to a side output on miss. In Spark that is one broadcast hash
  * join plus a `left_anti` for the miss channel; the dimension is tiny
  * (15 rows in the reference; at 100 TB fact scale the dimension is still
  * dimension-sized), so `broadcast()` keeps the fact table shuffle-free —
  * the enrichment never repartitions the 100 TB side.
  */
object Enrichment {

  final case class Enriched(rows: DataFrame, misses: DataFrame)

  /** P3 — `engagement_seconds = duration_ms / 1000` with Java **integer
    * division** semantics (`model/EnrichedEvent.java:93-96`); null when
    * `duration_ms` is null. Domain is non-negative, where integer division
    * == floor.
    */
  def engagementSeconds(durationMs: Column): Column =
    floor(durationMs / 1000).cast(IntegerType)

  /** P4 — `engagement_pct`, faithful to the reference's BigDecimal
    * two-step (`model/EnrichedEvent.java:98-106`):
    *
    *   `BigDecimal(es).divide(ls, scale=4, HALF_UP).multiply(100).setScale(2, HALF_UP)`
    *
    * The second `setScale(2)` is a mathematical no-op (a scale-4 value
    * times 100 already has exactly 2 decimals), so the whole computation
    * is a single HALF_UP rounding of `es/ls` at scale 4. We do it in
    * *integer arithmetic* — for a >= 0, b > 0:
    * `round_half_up(a/b, 4) * 10^4 = (2*a*10^4 + b) div (2*b)` —
    * so the result is exact, engine-portable (the same formula is
    * DuckDB-oracle-expressible), and never touches floating point.
    * Null unless both inputs are non-null and `length_seconds > 0`.
    */
  def engagementPct(engagementSeconds: Column, lengthSeconds: Column): Column = {
    val a = engagementSeconds.cast(LongType)
    val b = lengthSeconds.cast(LongType)
    // Exact long division A div D via pmod: (A - A mod D) is divisible by D,
    // so the double division below is exact (Spark `/` on longs is double
    // division; exact-quotient integer division round-trips losslessly).
    val A = a * 20000L + b
    val D = b * 2L
    val cents = ((A - pmod(A, D)) / D).cast(LongType) // == pct * 100, HALF_UP
    when(engagementSeconds.isNotNull && lengthSeconds.isNotNull && (b > 0L),
      (cents.cast(DecimalType(14, 2)) / 100).cast(DecimalType(12, 2)))
  }

  /** P6 — gates all real-time-view writes (`model/EnrichedEvent.java:162-164`,
    * applied `RedisSink.java:137-140`). */
  def hasValidEngagement(engagementPct: Column): Column =
    engagementPct.isNotNull && engagementPct >= 0

  /** P7 — defined-but-unused predicate in the reference; kept for API
    * parity (`model/EnrichedEvent.java:166-168`). */
  def isHighEngagement(engagementPct: Column): Column =
    engagementPct >= 50

  /** J1 + P5 — broadcast-hash enrichment join producing the 15-column
    * enriched schema (`model/EnrichedEvent.java:70-107`), with the
    * reference's enrichment-miss side output as an explicit `left_anti`
    * DataFrame.
    */
  def enrich(events: DataFrame, content: DataFrame): Enriched = {
    val dim = broadcast(content.select(
      col("id"), col("slug").as("content_slug"), col("title").as("content_title"),
      col("content_type"), col("length_seconds"), col("publish_ts")))
    val joined = events.join(dim, events("content_id") === dim("id"), "inner")
    val es = engagementSeconds(col("duration_ms"))
    val rows = joined.select(
      events("id").as("event_id"), col("content_id"), col("user_id"),
      col("event_type"), col("event_ts"), col("duration_ms"), col("device"),
      col("raw_payload"), col("content_slug"), col("content_title"),
      col("content_type"), col("length_seconds"), col("publish_ts"))
      .withColumn("engagement_seconds", es)
      .withColumn("engagement_pct",
        engagementPct(col("engagement_seconds"), col("length_seconds")))
    val misses = events.join(dim, events("content_id") === dim("id"), "left_anti")
    Enriched(rows, misses)
  }
}
