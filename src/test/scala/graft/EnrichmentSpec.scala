package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.enrich.Enrichment

/** P3/P4/P6 derived-column semantics pinned against the reference's Java
  * arithmetic (`model/EnrichedEvent.java:93-106`), incl. a seeded random
  * sweep of the BigDecimal two-step. */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  /** The reference formula, verbatim: divide at scale 4 HALF_UP, times
    * 100, setScale 2 HALF_UP (`model/EnrichedEvent.java:98-106`). */
  private def referencePct(es: Long, ls: Long): JBigDecimal =
    new JBigDecimal(es)
      .divide(new JBigDecimal(ls), 4, RoundingMode.HALF_UP)
      .multiply(new JBigDecimal(100))
      .setScale(2, RoundingMode.HALF_UP)

  test("P3: engagement_seconds is integer division, null-safe") {
    val df = Seq(Some(4999), Some(5000), Some(5001), Some(999), Some(0), None)
      .toDF("duration_ms")
      .select(Enrichment.engagementSeconds(col("duration_ms")).as("es"))
    df.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)) shouldBe
      Array(4, 5, 5, 0, 0, null)
  }

  test("P4: engagement_pct matches the BigDecimal two-step on edge cases") {
    val cases = Seq((1L, 3L), (2L, 3L), (1L, 7L), (5L, 8L), (1L, 80000L),
      (123L, 456L), (100L, 100L), (150L, 100L), (0L, 5L), (1L, 1L))
    val got = cases.toDF("es", "ls")
      .select(Enrichment.engagementPct(col("es"), col("ls")).as("pct"))
      .collect().map(_.getDecimal(0))
    cases.zip(got).foreach { case ((es, ls), g) =>
      g.compareTo(referencePct(es, ls)) shouldBe 0
    }
  }

  test("P4: seeded sweep — integer-arithmetic pct == BigDecimal pct") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(500)(
      (rnd.nextLong(100001L), 1L + rnd.nextLong(100000L)))
    val got = cases.toDF("es", "ls")
      .select(Enrichment.engagementPct(col("es"), col("ls")).as("pct"))
      .collect().map(_.getDecimal(0))
    cases.zip(got).foreach { case ((es, ls), g) =>
      withClue(s"es=$es ls=$ls: ") {
        g.compareTo(referencePct(es, ls)) shouldBe 0
      }
    }
  }

  test("P4: null unless both inputs present and length > 0") {
    val df = Seq((Some(10L), Some(0L)), (Some(10L), None), (None, Some(5L)))
      .toDF("es", "ls")
      .select(Enrichment.engagementPct(col("es"), col("ls")).as("pct"))
    df.collect().foreach(_.isNullAt(0) shouldBe true)
  }

  test("J1: enrichment joins on content_id; misses go to the anti channel") {
    val ts = Timestamp.valueOf("2025-08-08 10:00:00")
    val events = Seq(
      (1L, "c1", "u1", "play", ts, Some(30000), "ios", "{}"),
      (2L, "c1", "u2", "finish", ts, Some(100000), "web", "{}"),
      (3L, "cX", "u1", "play", ts, Some(1000), "ios", "{}"))
      .toDF("id", "content_id", "user_id", "event_type", "event_ts",
        "duration_ms", "device", "raw_payload")
    val content = Seq(("c1", "slug-1", "Title: One", "podcast", Some(100), ts))
      .toDF("id", "slug", "title", "content_type", "length_seconds", "publish_ts")

    val e = Enrichment.enrich(events, content)
    e.rows.count() shouldBe 2
    e.misses.select("id").as[Long].collect().toSet shouldBe Set(3L)

    val r = e.rows.filter(col("event_id") === 1L).head()
    r.getAs[Int]("engagement_seconds") shouldBe 30
    r.getAs[JBigDecimal]("engagement_pct").compareTo(
      referencePct(30L, 100L)) shouldBe 0
    r.getAs[String]("content_title") shouldBe "Title: One"
  }

  test("P6/P7 predicates") {
    val df = Seq(Some(java.math.BigDecimal.valueOf(0)),
      Some(java.math.BigDecimal.valueOf(50)), None).toDF("pct")
    df.select(Enrichment.hasValidEngagement(col("pct"))).as[Boolean]
      .collect() shouldBe Array(true, true, false)
    df.filter(Enrichment.isHighEngagement(col("pct"))).count() shouldBe 1
  }
}
