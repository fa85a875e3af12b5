package graft

import org.apache.spark.sql.functions._

/** The sketch query self-reports its error bound (|approx − exact|/exact
  * ≤ 0.05, computed Spark-side); assert every per-type gate is true and
  * the exact counts match an independent aggregation. */
class AdvancedQueriesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("approx sketches land within 5% of exact on every event type") {
    val rows = graft.SparkEntry.queries("adv_approx_sketches")(spark, d).collect()
    rows.length should be > 0
    val exact = graft.ingest.Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val k = r.getAs[String]("event_type")
      withClue(s"$k: ") {
        r.getAs[Long]("n_exact") shouldBe exact(k)
        r.getAs[Boolean]("users_within_bounds") shouldBe true
        r.getAs[Boolean]("median_within_bounds") shouldBe true
      }
    }
  }

  test("salted aggregation equals plain aggregation") {
    val salted = graft.SparkEntry.queries("adv_skew_salted_agg")(spark, d)
    val plain = graft.ingest.Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
          .cast("double").as("sum_value"))
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }
}
