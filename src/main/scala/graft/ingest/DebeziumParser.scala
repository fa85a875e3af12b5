package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

import graft.schemas.Schemas

/** Debezium CDC message normalization (reference operators P1/P2).
  *
  * The reference's connector config and its parser disagree on message
  * shape (SURVEY.md §1.4): the unwrap SMT emits *flattened* records
  * (`debezium/postgres-connector.json:28-32`) while the Flink parser reads
  * the *envelope* `payload.after` (`EngagementStreamingJob.java:219-227`).
  * We accept both shapes behind one normalization step, and we turn every
  * silent-drop path of the reference into an explicit, countable error
  * channel (SURVEY.md §7.4.6):
  *
  *   - `json_error`    — value is not parseable JSON (reference: side
  *                       output, `EngagementStreamingJob.java:254-257`)
  *   - `missing_after` — valid JSON but no row payload in either shape
  *                       (reference: silently dropped,
  *                       `EngagementStreamingJob.java:222-225`; includes
  *                       envelope-shaped DELETEs, which the insert-only
  *                       pipeline discards)
  *
  * Everything is declarative (`from_json` + `coalesce`), so Catalyst can
  * prune unused fields into the JSON parser (`JsonTuple`/schema pruning)
  * and the whole parse stays inside whole-stage codegen.
  */
object DebeziumParser {

  /** Result of parsing: one clean typed DataFrame, one error DataFrame
    * with columns (`value`, `error`).
    */
  final case class Parsed(rows: DataFrame, errors: DataFrame)

  /** Normalize a DataFrame holding raw message text in `valueCol` into the
    * given row schema. Timestamp-typed fields in `rowSchema` should be
    * declared as StringType and converted afterwards with
    * [[parseTimestampMicros]] (the reference keeps timestamps as strings
    * until a hard-coded micro-precision parse; we parse tolerantly).
    *
    * ONE `from_json` per row: the envelope member, the flattened row
    * fields and the corrupt-record marker live in a single merged schema,
    * so the JSON text is tokenized once — this is the hot path of the
    * whole CDC pipeline (the reference also single-parses, Jackson
    * `readTree`, `EngagementStreamingJob.java:219`).
    */
  def parse(df: DataFrame, rowSchema: StructType, valueCol: String = "value"): Parsed = {
    require(!rowSchema.fieldNames.contains("payload"),
      "row schema may not declare a field named 'payload' (reserved for the envelope)")
    val v = col(valueCol).cast(StringType)
    val merged = StructType(
      Schemas.envelope(rowSchema).fields ++
        Schemas.flattened(rowSchema).fields :+
        StructField("__corrupt", StringType, nullable = true))
    // EvalOnce pins the JSON tokenization to its own projection: without
    // it, CollapseProject/PushDownPredicates inline this from_json into
    // every downstream field extraction and the error predicate — one
    // parse per row becomes N+2 (measured 25 copies in the plan, ~4×
    // wall-clock on the parse path).
    val parsed = graft.functions.EvalOnce(from_json(v, merged,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "__corrupt")))

    val tagged0 = df.withColumn("__p", parsed)
    val p = col("__p")

    // A flattened record is "present" when any declared row field is
    // non-null AND it is not an envelope (envelopes have a payload member).
    val flatRow = struct(rowSchema.fieldNames.map(f => p.getField(f).as(f)).toSeq: _*)
    val flatPresent = rowSchema.fieldNames
      .map(f => p.getField(f).isNotNull)
      .reduce(_ || _)

    val isJson = v.isNotNull && p.getField("__corrupt").isNull
    val envAfter = p.getField("payload").getField("after")
    val after = when(envAfter.isNotNull, envAfter)
      .when(p.getField("payload").isNull && flatPresent, flatRow)

    val tagged = tagged0
      .withColumn("__after", after)
      .withColumn("__error",
        when(!isJson, lit("json_error"))
          .when(after.isNull, lit("missing_after")))

    val rows = tagged
      .filter(col("__error").isNull)
      .select(rowSchema.fieldNames.map(f => col("__after").getField(f).as(f)).toSeq: _*)
    val errors = tagged
      .filter(col("__error").isNotNull)
      .select(v.as("value"), col("__error").as("error"))
    Parsed(rows, errors)
  }

  /** Parse engagement-event messages (P1). */
  def parseEvents(df: DataFrame, valueCol: String = "value"): Parsed = {
    val p = parse(df, Schemas.engagementEvents, valueCol)
    p.copy(rows = p.rows.withColumn("event_ts", parseTimestampMicros(col("event_ts"))))
  }

  /** Parse content-dimension messages (P2). */
  def parseContent(df: DataFrame, valueCol: String = "value"): Parsed = {
    val stringly = StructType(Schemas.content.fields.map {
      case f if f.dataType == TimestampType => f.copy(dataType = StringType)
      case f => f
    })
    val p = parse(df, stringly, valueCol)
    p.copy(rows = p.rows.withColumn("publish_ts", parseTimestampMicros(col("publish_ts"))))
  }

  /** Tolerant micro-precision timestamp parse (P9).
    *
    * The reference hard-codes `yyyy-MM-dd'T'HH:mm:ss.SSSSSS`
    * (`EngagementStreamingJob.java:237-239`) and throws on anything else —
    * e.g. Postgres NOW() values with fewer fraction digits. We parse that
    * pattern first, then fall back to Spark's ISO parser, keeping
    * microsecond precision and never raising (ANSI-safe `try_to_timestamp`).
    */
  def parseTimestampMicros(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
    try_to_timestamp(c))
}
