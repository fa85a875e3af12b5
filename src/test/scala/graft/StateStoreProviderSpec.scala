package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{StatefulEnricher, StreamingBudget}
import graft.streaming.StatefulEnricher.{CdcRecord, ContentRec, EventRec}

/** The `flatMapGroupsWithState` twins must produce IDENTICAL output on
  * the default HDFS-backed state store and on RocksDB
  * (`RocksDBStateStoreProvider`, the provider a 100 TB stream runs on —
  * heap-backed state is the remaining scale risk once key cardinality
  * outgrows executor memory). The provider is a per-query runtime conf,
  * so each runner executes the same multi-batch feed under both
  * providers and the results are pinned equal. `transformWithState`
  * (StatefulViews) already runs on RocksDB in its own spec; this covers
  * the `GroupState` operators.
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

  private def onRocksDb[T](body: => T): T = {
    spark.conf.set(ProviderConf, RocksDb)
    try body finally spark.conf.unset(ProviderConf)
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
}
