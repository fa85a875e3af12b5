package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulViews
import graft.streaming.StatefulViews._

/** transformWithState content-stats: running counts across batches and
  * last-value semantics on RocksDB state with per-key TTL config.
  *
  * Harness note: with `TimeMode.ProcessingTime` the operator schedules
  * continuous no-data batches (TTL housekeeping), which keeps
  * `processAllAvailable` from ever settling — so the test polls the
  * memory sink under a deadline instead. The TTL expiry itself is
  * Spark-store behavior (wall-clocked, not deterministically testable);
  * what we own and pin is the processor's merge logic and that state
  * survives batch boundaries. */
class StatefulViewsSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, cid: String, pct: Double, t: String) = StatIn(
    cid, pct, "podcast", "T", "play", "ios", Timestamp.valueOf(t), id)

  test("state accumulates across batches with last-value fields") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[StatIn]
      val q = StatefulViews.contentStatsTtl(in.toDS(), Duration.ofHours(1))
        .writeStream.format("memory").queryName("ttlstats")
        .outputMode("update").trigger(Trigger.ProcessingTime("1 second")).start()
      def pollUntil(n: Long): Unit = {
        val deadline = System.currentTimeMillis + 90000
        while (spark.table("ttlstats").count() < n &&
          System.currentTimeMillis < deadline) Thread.sleep(250)
      }
      try {
        in.addData(row(1, "c1", 10.0, "2025-08-08 10:00:00"),
          row(2, "c1", 20.0, "2025-08-08 10:01:00"),
          row(3, "c2", 5.0, "2025-08-08 10:00:30"))
        pollUntil(2)
        in.addData(row(4, "c1", 30.0, "2025-08-08 10:02:00"))
        pollUntil(3)

        val rows = spark.table("ttlstats").collect()
        val c1Latest = rows.filter(_.getAs[String]("content_id") == "c1")
          .maxBy(_.getAs[Long]("total_events"))
        c1Latest.getAs[Long]("total_events") shouldBe 3L // crossed batches
        c1Latest.getAs[Double]("latest_engagement") shouldBe 30.0
        c1Latest.getAs[Timestamp]("last_updated") shouldBe
          Timestamp.valueOf("2025-08-08 10:02:00")
        rows.filter(_.getAs[String]("content_id") == "c2")
          .map(_.getAs[Long]("total_events")).max shouldBe 1L
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
