package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.Enrichment
import graft.ingest.Tables

/** Maps the driver fixtures (TESTDATA.md) onto the reference's CDC domain
  * so every pipeline operator can be exercised — and DuckDB-oracled — on
  * the deterministic parquet tables:
  *
  *   - fact  = `events`   (event_id, ts, user_id, event_type, value, props)
  *   - dim   = `customer` (c_custkey, c_name, c_mktsegment, c_acctbal)
  *
  * `events.user_id` is fully covered by `customer.c_custkey` at every SF,
  * so it plays the `content_id` FK; `value*1000` plays `duration_ms`;
  * `FLOOR(ABS(c_acctbal))` plays `length_seconds` (zero ⇒ engagement_pct
  * null, exercising the P4 guard); `props.k` plays `device` (exercising
  * JSON extraction); `props` plays `raw_payload`.
  *
  * The companion SQL CTEs below are the *same mapping* for the DuckDB
  * oracle; keep the two in lock-step.
  */
object CdcMapping {

  /** Fact side, named per `Schemas.engagementEvents`.
    *
    * The round-robin repartition emulates the SOURCE's input
    * parallelism: the real pipeline reads a multi-partition Kafka topic
    * (or a multi-split 100 TB table), but the fixture is one parquet row
    * group, which Spark cannot split — without this, every downstream
    * parse/enrich stage would serialize on one core, which is the
    * fixture artifact, not the plan. The fact still never HASH-shuffles
    * through enrichment (PlanSpec pins broadcast-only joins plus this
    * one source-side round-robin). */
  def fact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
      col("event_id").as("id"),
      col("user_id").as("content_id"),
      pmod(col("event_id"), lit(97)).as("user_id"),
      col("event_type"),
      col("ts").as("event_ts"),
      floor(col("value") * 1000).cast("int").as("duration_ms"),
      get_json_object(col("props"), "$.k").as("device"),
      col("props").as("raw_payload"))

  /** Dimension side, named per `Schemas.content`. */
  def dim(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(
      col("c_custkey").as("id"),
      col("c_name").as("slug"),
      col("c_name").as("title"),
      col("c_mktsegment").as("content_type"),
      floor(abs(col("c_acctbal"))).cast("int").as("length_seconds"),
      lit("2024-01-01 00:00:00").cast("timestamp").as("publish_ts"))

  /** The enriched stream (J1 + P3/P4/P5) over the fixtures. */
  def enriched(spark: SparkSession, sfDir: String): DataFrame =
    Enrichment.enrich(fact(spark, sfDir), dim(spark, sfDir)).rows

  // ---- DuckDB oracle CTE text (must mirror the builders above) ----

  val factSql: String =
    """fact AS (
      |  SELECT event_id AS id, user_id AS content_id,
      |         event_id % 97 AS user_id, event_type,
      |         ts AS event_ts,
      |         CAST(FLOOR(value * 1000) AS INTEGER) AS duration_ms,
      |         json_extract_string(props, '$.k') AS device,
      |         props AS raw_payload
      |  FROM events)""".stripMargin

  val dimSql: String =
    """dim AS (
      |  SELECT c_custkey AS id, c_name AS content_slug, c_name AS content_title,
      |         c_mktsegment AS content_type,
      |         CAST(FLOOR(ABS(c_acctbal)) AS INTEGER) AS length_seconds,
      |         TIMESTAMP '2024-01-01 00:00:00' AS publish_ts
      |  FROM customer)""".stripMargin

  /** `engagement_pct` as DOUBLE via the same exact integer HALF_UP formula
    * as [[Enrichment.engagementPct]] (cents = round(es/ls,4)*1e4 == pct*100).
    */
  val enrichedSql: String =
    s"""$factSql,
       |$dimSql,
       |enriched AS (
       |  SELECT f.id AS event_id, f.content_id, f.user_id, f.event_type, f.event_ts,
       |         f.duration_ms, f.device, f.raw_payload,
       |         d.content_slug, d.content_title, d.content_type,
       |         d.length_seconds, d.publish_ts,
       |         CAST(f.duration_ms // 1000 AS INTEGER) AS engagement_seconds,
       |         CASE WHEN d.length_seconds > 0 AND f.duration_ms IS NOT NULL THEN
       |           CAST((CAST(f.duration_ms // 1000 AS BIGINT) * 20000 + d.length_seconds)
       |                // (CAST(d.length_seconds AS BIGINT) * 2) AS DOUBLE) / 100
       |         END AS engagement_pct
       |  FROM fact f JOIN dim d ON f.content_id = d.id)""".stripMargin
}
