package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.views.EngagementViews

/** A1–A4 view semantics on a crafted micro-fixture: last-write-wins
  * determinism, P6 gating, zset-member dedup, top-K cardinality. */
class EngagementViewsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bd(v: String) = new java.math.BigDecimal(v)

  /** Minimal enriched-shaped frame: two contents, one invalid row, one
    * late-arriving higher-pct update for c1. */
  private lazy val enriched: DataFrame = Seq(
    // event_id, content_id, user_id, event_type, event_ts, device, type, title, pct
    (1L, "c1", "u1", "play", ts("2025-08-08 10:00:00"), "ios", "podcast", "T1", Some(bd("10.00"))),
    (2L, "c1", "u1", "finish", ts("2025-08-08 10:05:00"), "web", "podcast", "T1", Some(bd("90.00"))),
    (3L, "c2", "u2", "play", ts("2025-08-08 10:01:00"), "ios", "video", "T2", Some(bd("40.00"))),
    (4L, "c2", "u3", "click", ts("2025-08-08 10:02:00"), "web", "video", "T2", None), // invalid
    (5L, "c2", "u2", "play", ts("2025-08-08 10:01:00"), "tv", "video", "T2", Some(bd("40.00")))
  ).toDF("event_id", "content_id", "user_id", "event_type", "event_ts",
    "device", "content_type", "content_title", "engagement_pct")

  test("A1 leaderboard: latest pct per member, ranked, top-K bounded") {
    val lb = EngagementViews.leaderboard(enriched, k = 10).collect()
    lb.length shouldBe 2
    lb(0).getAs[String]("member") shouldBe "c1:podcast:T1"
    lb(0).getAs[java.math.BigDecimal]("score").compareTo(bd("90.00")) shouldBe 0
    EngagementViews.leaderboard(enriched, k = 1).count() shouldBe 1
  }

  test("A2 content stats: last-value fields + count gated by P6") {
    val cs = EngagementViews.contentStats(enriched)
      .orderBy("content_id").collect()
    val c1 = cs(0)
    c1.getAs[java.math.BigDecimal]("latest_engagement")
      .compareTo(bd("90.00")) shouldBe 0
    c1.getAs[String]("event_type") shouldBe "finish"
    c1.getAs[Long]("total_events") shouldBe 2L
    val c2 = cs(1)
    // event 4 (null pct) is excluded from the count by the P6 gate
    c2.getAs[Long]("total_events") shouldBe 2L
    // tie on event_ts between 3 and 5 → higher event_id (5, device tv) wins
    c2.getAs[String]("device") shouldBe "tv"
  }

  test("A3 user-content latest") {
    val uc = EngagementViews.userContentLatest(enriched)
    uc.count() shouldBe 2 // (u1,c1), (u2,c2); u3's only row is invalid
    val r = uc.filter(col("user_id") === "u2").head()
    r.getAs[Timestamp]("last_updated") shouldBe ts("2025-08-08 10:01:00")
  }

  test("A4 minute windows: distinct (minute, content, pct) triples") {
    val mw = EngagementViews.minuteWindows(enriched)
    // events 3 and 5 share (10:01, c2, 40.00) → one member (zset dedup)
    mw.count() shouldBe 3
    mw.filter(col("content_id") === "c2").count() shouldBe 1
  }

  test("TTL-at-read filter keeps only rows within the horizon") {
    val now = lit(ts("2025-08-08 10:06:00"))
    val kept = enriched.filter(
      EngagementViews.withinTtl(col("event_ts"), 300L, now))
    kept.select("event_id").as[Long].collect().toSet shouldBe Set(2L, 3L, 4L, 5L)
  }
}
