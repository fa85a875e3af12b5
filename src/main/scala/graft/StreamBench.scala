package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.Tables
import graft.streaming.{StatefulEnricher, StreamingAnomaly, StreamingBudget,
  StreamingFunnel, StreamingPipeline}

/** Measured throughput for the streaming half of the engine — the batch
  * registry has a per-query bench, but the stateful streaming twins
  * (enricher, funnel, budget, anomaly) and the 4-view CDC pipeline
  * previously had correctness pins only, so a streaming perf regression
  * was invisible to every artifact.
  *
  * Protocol per section: the input rows are materialized DRIVER-SIDE
  * before the clock starts (producing them is the generator/Kafka side's
  * cost — same rule as the batch pipeline metric), then fed through a
  * `MemoryStream` in `Chunks` slices with `processAllAvailable` after
  * each, so every section runs a real multi-micro-batch schedule. The
  * clock covers feed → last batch drained; query start/stop and data
  * prep sit outside it. All sections use state-TTL-free operator
  * variants (`NoTimeout`/event-time timeouts), so `processAllAvailable`
  * terminates — the `ProcessingTimeTimeout` enricher variant needs
  * sink-polling (see StreamingSpec) and is a semantics spec, not a
  * throughput path.
  */
object StreamBench {

  case class Section(name: String, rows: Long, sec: Double, batches: Int) {
    def rps: Double = if (sec > 0) rows / sec else 0.0
  }

  private val Chunks = 8

  private def chunked[T](xs: IndexedSeq[T]): Seq[IndexedSeq[T]] = {
    val size = math.max(1, (xs.length + Chunks - 1) / Chunks)
    xs.grouped(size).toSeq
  }

  /** Feed `chunks` through `add`, draining every query after each chunk;
    * returns (elapsedSec, batches of the first query). */
  private def drive[T](chunks: Seq[IndexedSeq[T]],
      add: Seq[T] => Unit, queries: Seq[StreamingQuery]): (Double, Int) = {
    val t0 = System.nanoTime()
    chunks.foreach { c =>
      add(c)
      queries.foreach(_.processAllAvailable())
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val batches = queries.headOption.flatMap(q => Option(q.lastProgress))
      .map(_.batchId.toInt + 1).getOrElse(chunks.size)
    queries.foreach(_.stop())
    (sec, batches)
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** The reference pipeline's SLO surface: raw CDC JSON → Debezium parse
    * → broadcast enrich → the four views (leaderboard / content stats /
    * user-latest via per-batch KV upserts, minute windows as a
    * watermarked streaming aggregation). One source, two concurrent
    * queries — the reference's single Flink dataflow fan-out. */
  private def pipelineSection(spark: SparkSession, sfDir: String): Section = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msgs = graft.queries.CdcQueries.jsonMessages(
        graft.queries.CdcMapping.fact(spark, sfDir))
      .select(col("value")).as[String].collect().toIndexedSeq
    val dim = graft.queries.CdcMapping.dim(spark, sfDir)
    val in = MemoryStream[String]
    val enriched = StreamingPipeline.enrichStream(in.toDF(), dim)
    val sink = new StreamingPipeline.InMemoryKvSink
    val qKv = StreamingPipeline.kvViewsWriter(enriched, sink)(tmp("sb_kv")).start()
    val qWin = StreamingPipeline.minuteWindowsStream(enriched)
      .writeStream.outputMode("update").format("noop")
      .option("checkpointLocation", tmp("sb_win")).start()
    val (sec, batches) = drive[String](chunked(msgs), in.addData(_), Seq(qKv, qWin))
    sink.close()
    Section("pipeline", msgs.length.toLong, sec, batches)
  }

  /** Reference-exact stateful enrichment (J1 option (c)): dimension rows
    * land first, then the event stream point-looks-up per-key state. */
  private def enrichSection(spark: SparkSession, sfDir: String): Section = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.queries.CdcMapping.fact(spark, sfDir).select(
        col("id").cast("long"), col("content_id").cast("string"),
        col("user_id").cast("string"), col("event_type").cast("string"),
        col("event_ts").cast("timestamp"), col("duration_ms").cast("int"),
        col("device").cast("string"), col("raw_payload").cast("string"))
      .as[StatefulEnricher.EventRec].collect().toIndexedSeq
    val dims = graft.queries.CdcMapping.dim(spark, sfDir).select(
        col("id").cast("string"), col("slug").cast("string"),
        col("title").cast("string"), col("content_type").cast("string"),
        col("length_seconds").cast("int"), col("publish_ts").cast("timestamp"))
      .as[StatefulEnricher.ContentRec].collect()
    val in = MemoryStream[StatefulEnricher.CdcRecord]
    val q = StatefulEnricher.enrich(in.toDS())
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", tmp("sb_enr")).start()
    // dimension snapshot first (the reference's initial-load phase),
    // then the event chunks — both on the clock: the dimension upserts
    // are pipeline work, not prep.
    val chunks: Seq[IndexedSeq[StatefulEnricher.CdcRecord]] =
      dims.map(c => StatefulEnricher.CdcRecord(c.id, None, Some(c))).toIndexedSeq +:
        chunked(evs.map(e => StatefulEnricher.CdcRecord(e.content_id, Some(e), None)))
    val (sec, batches) = drive[StatefulEnricher.CdcRecord](
      chunks, in.addData(_), Seq(q))
    Section("enrich_state", evs.length.toLong, sec, batches)
  }

  case class FunnelIn(key: String, step: Int, ts: Timestamp)

  /** Per-user view→click→purchase funnel state over the events fixture —
    * the same step predicates as the batch `op_funnel`. */
  private def funnelSection(spark: SparkSession, sfDir: String): Section = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir).select(
        col("user_id").cast("string").as("key"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2)
          .otherwise(-1).cast("int").as("step"),
        col("ts").cast("timestamp").as("ts"))
      .as[FunnelIn].collect().toIndexedSeq
    val in = MemoryStream[FunnelIn]
    val q = StreamingFunnel.funnelStream(in.toDF(), nSteps = 3)
      .writeStream.outputMode("update").format("noop")
      .option("checkpointLocation", tmp("sb_fun")).start()
    val (sec, batches) = drive[FunnelIn](chunked(evs), in.addData(_), Seq(q))
    Section("funnel", evs.length.toLong, sec, batches)
  }

  case class BudgetIn(source: String, doc_id: Long, n_tokens: Long)

  /** Per-source token-budget admission over the documents fixture — the
    * same quota as the batch `curate_token_budget`. */
  private def budgetSection(spark: SparkSession, sfDir: String): Section = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir).select(
        col("source").cast("string"), col("doc_id").cast("long"),
        graft.operators.TextAnalysis.tokenCount(col("text"))
          .cast("long").as("n_tokens"))
      .as[BudgetIn].collect().toIndexedSeq
    val in = MemoryStream[BudgetIn]
    val q = StreamingBudget.admitStream(in.toDF(), budget = 20000L)
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", tmp("sb_bud")).start()
    val (sec, batches) = drive[BudgetIn](chunked(docs), in.addData(_), Seq(q))
    Section("budget", docs.length.toLong, sec, batches)
  }

  case class AnomalyIn(key: String, event_id: Long, ts: Timestamp, x: Long)

  /** Per-event-type rolling 2-sigma anomaly state over the events
    * fixture — the same frame/minN as the batch
    * `analytics_rolling_zscore`. */
  private def anomalySection(spark: SparkSession, sfDir: String): Section = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type").cast("string").as("key"),
        col("event_id").cast("long"),
        col("ts").cast("timestamp"),
        floor(col("value")).cast("long").as("x"))
      .as[AnomalyIn].collect().toIndexedSeq
    val in = MemoryStream[AnomalyIn]
    val q = StreamingAnomaly.rollingZScoreStream(in.toDF())
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", tmp("sb_ano")).start()
    val (sec, batches) = drive[AnomalyIn](chunked(evs), in.addData(_), Seq(q))
    Section("anomaly", evs.length.toLong, sec, batches)
  }

  /** The TTL variant of the stateful enricher (`ProcessingTimeTimeout`)
    * schedules continuous housekeeping batches, so `processAllAvailable`
    * never settles — completion is observed by polling the memory sink
    * for the expected row count (every event emits exactly one enriched
    * or miss row), the same harness pattern StreamingSpec pins. The TTL
    * is set far above the section's wall time so no state evicts
    * mid-measurement — this times the timeout-managed state path's
    * throughput, not eviction races. */
  private def enrichTtlSection(spark: SparkSession, sfDir: String): Section = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.queries.CdcMapping.fact(spark, sfDir).select(
        col("id").cast("long"), col("content_id").cast("string"),
        col("user_id").cast("string"), col("event_type").cast("string"),
        col("event_ts").cast("timestamp"), col("duration_ms").cast("int"),
        col("device").cast("string"), col("raw_payload").cast("string"))
      .as[StatefulEnricher.EventRec].collect().toIndexedSeq
    val dims = graft.queries.CdcMapping.dim(spark, sfDir).select(
        col("id").cast("string"), col("slug").cast("string"),
        col("title").cast("string"), col("content_type").cast("string"),
        col("length_seconds").cast("int"), col("publish_ts").cast("timestamp"))
      .as[StatefulEnricher.ContentRec].collect()
    val in = MemoryStream[StatefulEnricher.CdcRecord]
    val sinkName = "sb_ttl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StatefulEnricher.enrich(in.toDS(), stateTtlMs = Some(3600L * 1000))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .option("checkpointLocation", tmp("sb_ttl")).start()
    val chunks: Seq[IndexedSeq[StatefulEnricher.CdcRecord]] =
      dims.map(c => StatefulEnricher.CdcRecord(c.id, None, Some(c))).toIndexedSeq +:
        chunked(evs.map(e => StatefulEnricher.CdcRecord(e.content_id, Some(e), None)))
    val expected = evs.length.toLong
    val deadline = System.currentTimeMillis() + 300000
    val t0 = System.nanoTime()
    var expectedSoFar = 0L
    chunks.foreach { c =>
      in.addData(c)
      expectedSoFar += c.count(_.event.isDefined)
      while (spark.table(sinkName).count() < expectedSoFar
        && System.currentTimeMillis() < deadline) Thread.sleep(50)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val n = spark.table(sinkName).count()
    val batches = Option(q.lastProgress).map(_.batchId.toInt + 1).getOrElse(0)
    q.stop()
    spark.catalog.dropTempView(sinkName)
    if (n < expected)
      System.err.println(s"WARN stream bench: enrich_ttl drained $n/$expected rows")
    Section("enrich_ttl", n, sec, batches)
  }

  /** Run all sections; order puts the one-time streaming-engine warm-up
    * on a tiny untimed query, not on any section's clock. A section that
    * throws is dropped with a warning — one broken twin must not zero
    * the perf signal of the others. */
  def run(spark: SparkSession, sfDir: String): Seq[Section] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // untimed warm-up: first streaming query pays micro-batch engine +
    // state-store + codegen init once
    try {
      val in = MemoryStream[BudgetIn]
      val q = StreamingBudget.admitStream(in.toDF(), budget = 100L)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", tmp("sb_warm")).start()
      in.addData((1 to 10).map(i => BudgetIn("w", i.toLong, 1L)))
      q.processAllAvailable()
      q.stop()
    } catch { case _: Throwable => () }
    val sections = Seq[(String, (SparkSession, String) => Section)](
      "pipeline" -> pipelineSection,
      "enrich_state" -> enrichSection,
      "enrich_ttl" -> enrichTtlSection,
      "funnel" -> funnelSection,
      "budget" -> budgetSection,
      "anomaly" -> anomalySection)
    sections.flatMap { case (name, fn) =>
      try Some(fn(spark, sfDir)) catch {
        case e: Throwable =>
          System.err.println(
            s"WARN stream bench: section $name failed: ${e.getClass.getName}: ${e.getMessage}")
          None
      }
    }
  }
}
