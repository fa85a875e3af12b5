package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.enrich.Enrichment
import graft.ingest.DebeziumParser
import graft.views.EngagementViews

/** Structured Streaming wiring of the CDC pipeline (SURVEY.md §7 step 4).
  *
  * The reference runs one hand-built Flink dataflow
  * (`EngagementStreamingJob.java:64-120`): Kafka → parse → keyed-state
  * enrich → Redis/BigQuery. Here the same logic flows through
  * `readStream` with micro-batch semantics:
  *
  *   - source: Kafka (`format("kafka")`) or any raw `value` stream
  *     (MemoryStream in tests) — S1/S2;
  *   - parse: the SAME batch [[DebeziumParser]] columns (streaming and
  *     batch share one implementation — Catalyst doesn't care);
  *   - enrich: stream-static broadcast join (J1 option (a), SURVEY §2.3);
  *     the exact drop-on-miss variant is [[StatefulEnricher]];
  *   - A4 window: event-time 1-minute tumbling window behind a watermark
  *     — the reference has NO watermark (state never expires,
  *     `EngagementStreamingJob.java:77,83`); we bound state by the same
  *     10-minute horizon its Redis TTL imposes (T4);
  *   - K1: per-micro-batch KV upsert via `foreachBatch` (A1–A3 recomputed
  *     on the batch, last-write-wins into the sink — idempotent under
  *     replay, matching the reference's convergence story T5);
  *   - K2/K3: hour-partitioned parquet warehouse in append mode —
  *     micro-batching IS the reference's hand-built 10k/30s buffer.
  *
  * Exactly-once: checkpointLocation + the file sink's commit log give the
  * genuinely-exactly-once path the reference only claims (T5).
  */
object StreamingPipeline {

  /** Reader options for the Kafka source — factored out so the wiring
    * is assertable without the connector jar on the classpath. */
  def kafkaOptions(bootstrap: String, topic: String,
      startingOffsets: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  /** The value projection applied to the connector's output schema
    * (binary `value` + metadata columns): string-deserialize, drop the
    * rest — the reference's value-only `SimpleStringSchema`. */
  def valueAsString(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped.selectExpr("CAST(value AS STRING) AS value")

  /** S1/S2 — Kafka value stream (string-deserialized, like the
    * reference's value-only `SimpleStringSchema`). Requires the
    * `spark-sql-kafka-0-10` connector on the classpath (not shipped in
    * this build's offline jar set — KafkaWiringSpec asserts the option
    * map and the value projection, and tests drive the same pipeline
    * through MemoryStream; the parse/enrich/view stages are
    * source-agnostic). */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String): DataFrame =
    valueAsString(
      spark.readStream.format("kafka")
        .options(kafkaOptions(bootstrap, topic, startingOffsets))
        .load())

  /** Parse + enrich a raw CDC value stream against a static/batch
    * dimension. Returns the enriched stream; misses surface via
    * [[Enrichment.enrich]]'s anti-join channel on the batch side or via
    * [[StatefulEnricher]] for reference-exact ordering.
    *
    * Initial snapshot (S5, `snapshot.mode=initial`): run the SAME
    * parse/enrich in batch mode over the backfill data into the same
    * warehouse path first, then start the stream from its checkpoint —
    * batch and streaming share every stage here, and the file sink's
    * commit log keeps the handoff exactly-once (proven by the
    * checkpoint-restart case in StreamingSpec). */
  def enrichStream(rawEvents: DataFrame, contentDim: DataFrame): DataFrame = {
    val parsed = DebeziumParser.parseEvents(rawEvents)
    Enrichment.enrich(parsed.rows, contentDim).rows
  }

  /** A4 — watermarked 1-minute tumbling windows over the enriched
    * stream; append-mode-compatible (rows emit once the watermark passes
    * the window end). Zset-member dedup ⇒ group by the full triple. */
  def minuteWindowsStream(enriched: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    EngagementViews.validOnly(enriched)
      .withWatermark("event_ts", watermark)
      .groupBy(
        window(col("event_ts"), "1 minute").as("w"),
        col("content_id"), col("engagement_pct"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_minute"),
        col("content_id"), col("engagement_pct"), col("n_events"))

  /** Streaming exact dedup: keep the first arrival per content digest,
    * with state bounded by the watermark (`dropDuplicatesWithinWatermark`
    * — duplicates later than the delay threshold may reappear, the
    * documented trade for bounded state at 100 TB stream volume). */
  def exactDedupStream(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__digest", md5(graft.operators.Dedup.normalize(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming changelog APPLY: per-key current state maintained in
    * update mode — the latest change by (tsCol, seqCol) wins, and a
    * delete op surfaces as `is_deleted = true` (a KV/warehouse sink
    * turns that into a removal; a retractionless sink keeps the
    * tombstone). Same single-aggregation shape as the batch
    * `cdc_apply_changelog`, just behind `readStream`. */
  def applyChangelogStream(changes: DataFrame, keyCol: String,
      tsCol: String, seqCol: String, opCol: String): DataFrame = {
    val payload = struct(
      changes.columns.filterNot(_ == keyCol).toIndexedSeq.map(col): _*)
    changes
      .groupBy(col(keyCol))
      .agg(max_by(payload, struct(col(tsCol), col(seqCol))).as("last"))
      .select(col(keyCol), col("last.*"))
      .withColumn("is_deleted", col(opCol) === "d")
  }

  /** Streaming twin of the batch corpus-curation capstone: language and
    * quality gates are the SAME map-only column expressions (Catalyst
    * does not care that the source is a stream), and exact dedup keeps
    * the first arrival per content digest with state bounded by the
    * watermark. This is the shape of a streaming training-data intake:
    * gate early (cheap, map-only, before any state), dedup late. */
  def curateStream(docs: DataFrame, textCol: String, tsCol: String,
      minQuality: Double = 0.5, lang: String = "en",
      watermark: String = "10 minutes"): DataFrame = {
    val gated = docs.filter(
      graft.operators.TextAnalysis.langId(col(textCol)) === lang &&
        graft.operators.TextAnalysis.qualityScore(col(textCol)) >= minQuality)
    exactDedupStream(gated, textCol, tsCol, watermark)
  }

  /** Streaming corpus-frequency scoring — the rescore half of the batch
    * `text_corpus_freq` as a streaming intake stage. The vocabulary is
    * a STATIC frame (columns `tok`, `corpus_freq`): corpus token counts
    * are a batch artifact refreshed per corpus snapshot — a stream
    * cannot hold an ever-growing corpus aggregation, and scoring
    * against a pinned vocabulary is also what makes replays
    * deterministic. Shape: explode the token array, broadcast-join the
    * vocabulary (documents never shuffle wide — the exchange carries
    * (id, ts, token)), re-aggregate per document behind the watermark;
    * state is one partial-sum row per in-flight document, expired by
    * the horizon. Tokens absent from the vocabulary count frequency 0
    * (left join) — exactly how out-of-corpus junk should score low. */
  def corpusFreqStream(docs: DataFrame, vocab: DataFrame, textCol: String,
      idCol: String, tsCol: String, watermark: String = "10 minutes"): DataFrame = {
    val toks = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        explode(graft.operators.TextAnalysis.tokens(col(textCol))).as("tok"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col(tsCol), col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(coalesce(col("corpus_freq"), lit(0L))).as("sum_freq"))
      .select(col(idCol), col("n_tokens"), col("sum_freq"),
        (col("sum_freq").cast("double") / col("n_tokens").cast("double"))
          .as("avg_freq"))
  }

  /** Streaming data-quality gate: row-level constraint checks as
    * map-only column expressions, so a 100 TB/day stream is gated with
    * ZERO state — rows route to the clean stream or, with the failed
    * check names attached, to a quarantine channel (the streaming twin
    * of the batch `wh_dq_checks` table-level suite; per-batch metric
    * totals belong in a foreachBatch aggregation over these flags).
    * Checks: non-null key, value within [lo, hi], parseable timestamp.
    * Returns (clean, quarantined). */
  def dqGateStream(rows: DataFrame, keyCol: String, valueCol: String,
      lo: Double, hi: Double, tsCol: String): (DataFrame, DataFrame) = {
    val failed = array_compact(array(
      when(col(keyCol).isNull, lit(s"null_$keyCol")),
      when(col(valueCol).isNull ||
        col(valueCol) < lo || col(valueCol) > hi, lit(s"range_$valueCol")),
      when(col(tsCol).isNull, lit(s"null_$tsCol"))))
    val flagged = rows.withColumn("__failed", failed)
    (flagged.filter(size(col("__failed")) === 0).drop("__failed"),
      flagged.filter(size(col("__failed")) > 0)
        .withColumn("failed_checks", col("__failed")).drop("__failed"))
  }

  /** Stream-stream interval join: each left event pairs with right
    * events of the same key whose timestamp falls in
    * `[leftTs − lookbackSeconds, leftTs]` — the attribution join
    * (click ← preceding views) as a genuine two-sided stream join.
    *
    * Both sides are watermarked, and the time-bound condition is what
    * lets Spark EXPIRE join state: without it, either side's state
    * grows forever. State per key is bounded by
    * watermark delay + lookback — the 100 TB stream-join invariant.
    * (The stream-static broadcast join in [[enrichStream]] remains the
    * right shape for dimension enrichment; this is for fact-to-fact
    * correlation.) */
  def intervalJoinStreams(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      lookbackSeconds: Long, watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col(rightTs) <= col(leftTs),
      joinType)
  }

  /** Minimal KV-view sink contract (the Redis surface K1): upsert a
    * (key, value) pair; last write wins. */
  trait KvSink extends Serializable {
    def upsert(view: String, key: String, value: String): Unit
  }

  /** In-memory KV sink for tests/local runs; thread-safe. The backing
    * map lives in a JVM-global registry keyed by sink id, so the copies
    * task-closure serialization creates on executors all write to the
    * same store (the single-JVM analogue of each executor partition
    * holding a connection to the same external KV service). */
  final class InMemoryKvSink extends KvSink {
    private val id = java.util.UUID.randomUUID().toString
    def store: ConcurrentHashMap[String, String] =
      InMemoryKvSink.stores.computeIfAbsent(id,
        _ => new ConcurrentHashMap[String, String]())
    def upsert(view: String, key: String, value: String): Unit =
      store.put(s"$view/$key", value)
    def get(view: String, key: String): Option[String] =
      Option(store.get(s"$view/$key"))
    /** Release the backing store from the JVM-global registry. The
      * registry is keyed per sink instance, so without this every sink
      * ever created would pin its map for the JVM lifetime. */
    def close(): Unit = InMemoryKvSink.stores.remove(id)
  }

  object InMemoryKvSink {
    private val stores =
      new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
  }

  /** K1 — per-micro-batch maintenance of the A1–A3 views into a KV sink.
    * Each batch recomputes the views *on the batch's rows* and upserts —
    * exactly the reference's per-event ZADD/HSET pattern, amortized to
    * micro-batches. Upserts run EXECUTOR-SIDE via `foreachPartition`
    * (the sink is serialized into each task — a production sink opens
    * its connection per partition there): the driver never materializes
    * a view, so A2/A3's per-batch key space — unbounded at high event
    * rates — streams straight from the executors to the KV service. */
  /** One small shared pool for the per-batch view jobs: the three views
    * are independent Spark jobs over the SAME cached micro-batch, so
    * running them serially leaves the cluster idle for two-thirds of
    * the batch — each view's shuffle is tiny (a micro-batch of rows)
    * and nowhere near saturating the executors on its own. Daemon
    * threads; sized to the view count, not the machine. */
  private lazy val viewJobPool =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(3,
        (r: Runnable) => {
          val t = new Thread(r, "kv-view-job")
          t.setDaemon(true)
          t
        }))

  def kvViewsWriter(enriched: DataFrame, sink: KvSink, topK: Int = 100)(
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    def upsertAll(view: DataFrame)(
        row: org.apache.spark.sql.Row => (String, String, String)): Unit =
      view.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        it.foreach { r =>
          val (v, k, value) = row(r)
          sink.upsert(v, k, value)
        }
      }
    enriched.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        val sc = batch.sparkSession.sparkContext
        // Pool threads inherit Spark's thread-local job properties only
        // at THREAD CREATION, so without an explicit group the second
        // and later batches' view jobs would run under batch 0's stale
        // group — StreamingQuery.stop() could not cancel them. Each
        // future sets the current batch's group itself (interrupt-on-
        // cancel), and the first failure cancels the sibling jobs via
        // the group instead of letting them keep upserting into the KV
        // sink after the batch has already failed.
        val group = s"kv-views-$batchId"
        try {
          // No separate materialization job: the three concurrent view
          // jobs race to the cache, and the per-partition cache locks
          // ensure each partition is computed exactly once (the losers
          // block briefly, then read) — one fewer job per micro-batch.
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration._
          implicit val ec = viewJobPool
          def viewJob(body: => Unit): Future[Unit] = Future {
            sc.setJobGroup(group, s"kv view jobs, micro-batch $batchId",
              interruptOnCancel = true)
            try body finally sc.clearJobGroup()
          }
          val jobs = Seq(
            viewJob(upsertAll(EngagementViews.leaderboard(b, topK)) { r =>
              ("top_engagement", r.getAs[String]("member"),
                r.getAs[java.math.BigDecimal]("score").toPlainString)
            }),
            viewJob(upsertAll(EngagementViews.contentStats(b)) { r =>
              ("content_stats", r.getAs[String]("content_id"),
                Seq("latest_engagement", "content_type", "content_title",
                  "event_type", "device", "total_events")
                  .map(f => s"$f=${r.getAs[Any](f)}").mkString(","))
            }),
            viewJob(upsertAll(EngagementViews.userContentLatest(b)) { r =>
              ("user_engagement",
                s"${r.getAs[String]("user_id")}:${r.getAs[String]("content_id")}",
                r.getAs[java.math.BigDecimal]("engagement_pct").toPlainString)
            }))
          // bounded: a wedged view job fails the batch (and the retry
          // machinery above it) instead of hanging foreachBatch forever
          try Await.result(Future.sequence(jobs), 10.minutes)
          catch {
            case e: Throwable => sc.cancelJobGroup(group); throw e
          }
        } finally b.unpersist()
        ()
      }
  }

  /** K2/K3 — hour-partitioned parquet warehouse (the BigQuery table:
    * `TimePartitioning(HOUR, event_ts)` + clustering (content_type,
    * event_type), `BigQuerySink.java:104-145`). Partition pruning on
    * `event_hour` replaces BQ partition pruning; AQE-coalesced writes
    * replace the 10k/30s hand buffer. */
  def warehouseWriter(enriched: DataFrame, path: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"))
      : DataStreamWriter[org.apache.spark.sql.Row] =
    enriched
      .withColumn("event_hour",
        date_format(date_trunc("hour", col("event_ts")), "yyyy-MM-dd-HH"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .partitionBy("event_hour")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** Convenience: run a whole in-memory pipeline once (tests/demos) —
    * process all available source data, then stop. */
  def runOnce(writer: DataStreamWriter[org.apache.spark.sql.Row]): StreamingQuery = {
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
