package graft

import org.apache.spark.sql.functions._

/** Approximate sketches have no cross-engine oracle; bound their error
  * against exact answers on the sf0.001 fixture here. */
class AdvancedQueriesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("approx_count_distinct within 10% of exact; approx median within p40–p60") {
    val approx = graft.SparkEntry.queries("adv_approx_sketches")(spark, d)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Double]("approx_median"))).toMap
    val exact = graft.ingest.Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"),
        expr("percentile(value, 0.5)").as("med"),
        expr("percentile(value, 0.4)").as("p40"),
        expr("percentile(value, 0.6)").as("p60"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("p40"), r.getAs[Double]("p60"))).toMap
    exact.foreach { case (k, (n, p40, p60)) =>
      val (an, amed) = approx(k)
      withClue(s"$k: ") {
        math.abs(an - n).toDouble / n should be <= 0.10
        amed should (be >= p40 and be <= p60)
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
