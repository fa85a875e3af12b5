package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{StatefulEnricher, StreamingBudget, StreamingDedup,
  StreamingPipeline}
import graft.streaming.StatefulEnricher.{CdcRecord, ContentRec, EventRec}

/** The stateful streaming operators must produce IDENTICAL output on
  * the default HDFS-backed state store and on RocksDB
  * (`RocksDBStateStoreProvider`, the provider a 100 TB stream runs on —
  * heap-backed state is the remaining scale risk once key cardinality
  * outgrows executor memory). The provider is a per-query runtime conf,
  * so each runner executes the same multi-batch feed under both
  * providers and the results are pinned equal. `transformWithState`
  * (StatefulViews) already runs on RocksDB in its own spec; this covers
  * the `GroupState` operators AND the watermark-eviction operators
  * (`dropDuplicatesWithinWatermark`, watermarked window aggregation) —
  * different state-store codepaths (range-scan eviction vs keyed
  * get/put), so the GroupState pins don't transfer.
  */
class StateStoreProviderSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  private def uniq(prefix: String) =
    prefix + java.util.UUID.randomUUID().toString.replace("-", "")

  /** Two-batch token-budget feed: cross-batch state (web's quota spent
    * in batch 1 stays spent in batch 2). */
  private def runBudget(): Seq[(String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val name = uniq("ssp_budget_")
    val q = StreamingBudget.admitStream(
        in.toDF().toDF("source", "doc_id", "n_tokens"), budget = 100L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(("web", 1L, 60L), ("web", 2L, 50L), ("books", 10L, 30L))
    q.processAllAvailable()
    in.addData(("web", 3L, 10L), ("books", 11L, 80L), ("books", 12L, 5L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).orderBy("source", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  /** Two-batch stateful enrichment: the dimension upsert in batch 1 must
    * be visible to batch 2's event via persisted state. */
  private def runEnricher(): Seq[(Long, Boolean, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcRecord]
    val name = uniq("ssp_enr_")
    val q = StatefulEnricher.enrich(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def ev(id: Long, cid: String) = EventRec(id, cid, s"u$id", "play",
      Timestamp.valueOf("2025-08-08 10:00:00"), Some(30000), "ios", "{}")
    in.addData(
      CdcRecord("c1", None, Some(ContentRec("c1", "s", "T", "video",
        Some(100), Timestamp.valueOf("2025-08-01 00:00:00")))),
      CdcRecord("c1", Some(ev(1, "c1")), None),
      CdcRecord("c2", Some(ev(2, "c2")), None)) // miss: no c2 dim
    q.processAllAvailable()
    in.addData(CdcRecord("c1", Some(ev(3, "c1")), None)) // state from batch 1
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).orderBy("event_id")
      .select("event_id", "matched", "content_title")
      .as[(Long, Boolean, String)].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  /** Three-batch dedup-gate feed exercising BOTH state transitions:
    * a within-horizon duplicate (batch 2 replays a batch-1 digest →
    * dropped via persisted state) and a post-eviction replay (batch 2's
    * far-ahead row advances the watermark past the first digests, so
    * batch 3's replay of "alpha" is admitted again — the documented
    * bounded-state trade). */
  private def runDedupGate(): Seq[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val name = uniq("ssp_ded_")
    val q = StreamingDedup.dedupStream(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "30 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    in.addData((1L, "alpha", t("2025-08-08 10:00:00")),
      (2L, "beta", t("2025-08-08 10:00:05")))
    q.processAllAvailable()
    // doc 3: duplicate inside the horizon → dropped by cross-batch state;
    // doc 4: advances max event time to 10:02:00 → watermark 10:01:30
    in.addData((3L, "alpha", t("2025-08-08 10:00:10")),
      (4L, "gamma", t("2025-08-08 10:02:00")))
    q.processAllAvailable()
    // alpha's state (event time 10:00:00) is now evicted → readmitted;
    // gamma (10:02:00, above the watermark) is still held → dropped
    in.addData((5L, "alpha", t("2025-08-08 10:02:30")),
      (6L, "gamma", t("2025-08-08 10:02:10")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  /** Watermarked minute-window aggregation (the pipeline's A4 view) in
    * append mode: batch 2 merges rows into batch-1 window state, the
    * far-ahead row closes the first windows, and the extra empty-ish
    * batch lets the advanced watermark flush them to the sink. */
  private def runWindowAgg(): Seq[(Timestamp, String, Double, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val name = uniq("ssp_win_")
    val q = StreamingPipeline.minuteWindowsStream(
        in.toDF().toDF("event_ts", "content_id", "engagement_pct"),
        watermark = "1 minute")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    in.addData((t("2025-08-08 10:00:10"), "c1", 50.0),
      (t("2025-08-08 10:01:10"), "c2", 80.0))
    q.processAllAvailable()
    // same (window, content, pct) group as batch 1's first row — merges
    // into existing window state; the 10:05 row advances the watermark
    in.addData((t("2025-08-08 10:00:20"), "c1", 50.0),
      (t("2025-08-08 10:05:00"), "c3", 10.0))
    q.processAllAvailable()
    // watermark computed from batch 2 (10:04:00) takes effect now and
    // emits the closed 10:00 / 10:01 windows
    in.addData((t("2025-08-08 10:09:00"), "c3", 10.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .orderBy("window_minute", "content_id")
      .as[(Timestamp, String, Double, Long)].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  private def onRocksDb[T](body: => T): T = {
    spark.conf.set(ProviderConf, RocksDb)
    try body finally spark.conf.unset(ProviderConf)
  }

  /** Two-batch count-min stream: the custom typed imperative
    * aggregate's buffer serializes into the state store between
    * batches, so this exercises [[graft.functions.SketchAggregates
    * .CmsSketchAgg]]'s serialize/deserialize/merge roundtrip through
    * BOTH providers (the memory-backed store and RocksDB keep state
    * rows in different encodings). */
  private def runCmsSketch(): Seq[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val name = uniq("ssp_cms_")
    val q = graft.operators.Sketch.cmsSketch(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    in.addData((1L, "alpha beta gamma"), (2L, "alpha delta"))
    q.processAllAvailable()
    in.addData((3L, "beta beta epsilon"), (4L, "alpha"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).orderBy("r", "b")
      .as[(Long, Long, Long)].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test("token-budget state is provider-invariant (default vs RocksDB)") {
    val default = runBudget()
    val rocks = onRocksDb(runBudget())
    default should not be empty
    rocks shouldBe default
  }

  test("stateful enricher output is provider-invariant (default vs RocksDB)") {
    val default = runEnricher()
    val rocks = onRocksDb(runEnricher())
    default shouldBe Seq((1L, true, "T"), (2L, false, null), (3L, true, "T"))
    rocks shouldBe default
  }

  test("dedup gate eviction is provider-invariant (default vs RocksDB)") {
    val default = runDedupGate()
    val rocks = onRocksDb(runDedupGate())
    // 3 dropped (within-horizon dup), 5 readmitted (state evicted),
    // 6 dropped (gamma still inside the horizon)
    default shouldBe Seq(1L, 2L, 4L, 5L)
    rocks shouldBe default
  }

  /** Two-batch HLL stream — same roundtrip coverage as [[runCmsSketch]]
    * for [[graft.functions.SketchAggregates.HllSketchAgg]]'s
    * serialize/deserialize/max-merge through both providers. */
  private def runHllSketch(): Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val name = uniq("ssp_hll_")
    val q = graft.operators.Sketch.hllRegisters(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    in.addData((1L, "alpha beta gamma delta"), (2L, "alpha delta epsilon zeta"))
    q.processAllAvailable()
    in.addData((3L, "beta beta epsilon eta theta"), (4L, "alpha iota kappa"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).orderBy("bucket")
      .as[(Long, Long)].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test("hll aggregate state is provider-invariant (default vs RocksDB)") {
    val default = runHllSketch()
    val rocks = onRocksDb(runHllSketch())
    default should not be empty
    rocks shouldBe default
  }

  test("count-min aggregate state is provider-invariant (default vs RocksDB)") {
    val default = runCmsSketch()
    val rocks = onRocksDb(runCmsSketch())
    default should not be empty
    // the drained stream equals a one-shot batch sketch of the same
    // corpus — the cross-batch buffer roundtrip lost nothing...
    import spark.implicits._
    val batch = graft.operators.Sketch.cmsSketch(
        Seq((1L, "alpha beta gamma"), (2L, "alpha delta"),
          (3L, "beta beta epsilon"), (4L, "alpha")).toDF("doc_id", "text"))
      .orderBy("r", "b").as[(Long, Long, Long)].collect().toSeq
    default shouldBe batch
    // ...under either provider
    rocks shouldBe default
  }

  /** Two-batch KMV stream — same roundtrip coverage as [[runCmsSketch]]
    * for [[graft.functions.SketchAggregates.KmvSketchAgg]]'s
    * serialize/deserialize/union-merge through both providers. */
  private def runKmvSketch(): Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val name = uniq("ssp_kmv_")
    val q = graft.operators.Sketch.kmvMins(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    in.addData((1L, "alpha beta gamma delta"), (2L, "alpha delta epsilon zeta"))
    q.processAllAvailable()
    in.addData((3L, "beta beta epsilon eta theta"), (4L, "alpha iota kappa"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).orderBy("rk")
      .as[(Long, Long)].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test("kmv aggregate state is provider-invariant (default vs RocksDB)") {
    val default = runKmvSketch()
    val rocks = onRocksDb(runKmvSketch())
    default should not be empty
    rocks shouldBe default
  }

  /** Two-batch decontamination-monitor stream: the TWO conditional
    * per-split KMV buffers (train / holdout) roundtrip the state store
    * per batch, including null inputs on the off-split rows of each
    * conditional aggregate and the post-aggregation merged-sketch
    * arithmetic. */
  private def runDecontam(): Seq[(Long, Long, Long, Double, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val name = uniq("ssp_dec_")
    val q = graft.operators.Sketch.kmvDecontam(
        in.toDF().toDF("doc_id", "text"), k = 8, n = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    in.addData((1L, "alpha beta gamma delta"), (2L, "alpha delta epsilon zeta"))
    q.processAllAvailable()
    in.addData((3L, "beta beta epsilon eta theta"), (4L, "alpha iota kappa"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test("decontamination monitor is provider-invariant (default vs RocksDB)") {
    val default = runDecontam()
    val rocks = onRocksDb(runDecontam())
    default.length shouldBe 1
    rocks shouldBe default
  }

  test("kmv aggregate deserialize rejects mismatched state geometry") {
    // a foreign/truncated state-store row must fail loud: a byte count
    // that is not a multiple of 8, or more than k values, is not a KMV
    // buffer
    val agg = graft.functions.SketchAggregates.KmvSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null), 4)
    val buf = agg.createAggregationBuffer()
    Seq(5L, 1L, 3L).foreach(h => buf.add(h))
    val ok = agg.serialize(buf)
    val back = agg.deserialize(ok)
    back.size shouldBe 3
    back.first() shouldBe 1L
    intercept[IllegalArgumentException] {
      agg.deserialize(ok.take(ok.length - 3))
    }.getMessage should include("geometry mismatch")
    intercept[IllegalArgumentException] {
      agg.deserialize(ok ++ Array.fill[Byte](16)(0))
    }
  }

  test("count-min aggregate deserialize rejects mismatched state geometry") {
    // a truncated or foreign state-store row must fail loud at
    // deserialize, not surface as an AIOOBE inside merge() (short
    // buffer) or silently carry extra cells (long buffer)
    val agg = graft.functions.SketchAggregates.CmsSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null), 4, 256)
    val ok = agg.serialize(agg.createAggregationBuffer())
    agg.deserialize(ok).length shouldBe 4 * 256
    val short = intercept[IllegalArgumentException] {
      agg.deserialize(ok.take(ok.length - 8))
    }
    short.getMessage should include("geometry mismatch")
    intercept[IllegalArgumentException] {
      agg.deserialize(ok ++ Array.fill[Byte](8)(0))
    }
  }

  test("windowed aggregation is provider-invariant (default vs RocksDB)") {
    def t(s: String) = Timestamp.valueOf(s)
    val default = runWindowAgg()
    val rocks = onRocksDb(runWindowAgg())
    // only the watermark-closed windows surface in append mode; c1's two
    // arrivals merged across batches into one count-2 row, and batch 3's
    // 10:09 row pushes the watermark to 10:08 which closes c3's 10:05
    // window too
    default shouldBe Seq(
      (t("2025-08-08 10:00:00"), "c1", 50.0, 2L),
      (t("2025-08-08 10:01:00"), "c2", 80.0, 1L),
      (t("2025-08-08 10:05:00"), "c3", 10.0, 1L))
    rocks shouldBe default
  }
}
