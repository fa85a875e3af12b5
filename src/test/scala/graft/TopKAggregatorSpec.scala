package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.queries.CdcMapping
import graft.views.EngagementViews

/** The incremental top-K accumulator must agree exactly with the
  * sort-limit leaderboard path, including partial-merge associativity. */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("topK agg == orderBy.limit on the fixture leaderboard") {
    val d = "/root/testdata/sf0.001"
    val enriched = CdcMapping.enriched(spark, d)
    val sortLimit = EngagementViews.leaderboard(enriched, 20)
      .select("member", "score").as[(String, java.math.BigDecimal)]
      .collect().map { case (m, s) => (m, s.doubleValue) }

    val latest = EngagementViews.validOnly(enriched)
      .withColumn("member", EngagementViews.member)
      .groupBy(col("member"))
      .agg(max_by(col("engagement_pct"), struct(col("event_ts"), col("event_id")))
        .cast("double").as("score"))
    val viaAgg = latest
      .repartition(7) // force partial buffers + merge
      .agg(TopKAggregator.topK(20)(col("member"), col("score")).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e._1").as("member"), col("e._2").as("score"))
      .as[(String, Double)].collect()

    viaAgg.toSeq shouldBe sortLimit.toSeq
  }

  test("merge keeps only k and respects the (score desc, member asc) order") {
    val agg = new graft.functions.TopKAggregator(3)
    val a = agg.reduce(agg.reduce(agg.zero, ("a", 1.0)), ("b", 5.0))
    val b = agg.reduce(agg.reduce(agg.zero, ("c", 3.0)), ("d", 5.0))
    agg.merge(a, b) shouldBe Seq(("b", 5.0), ("d", 5.0), ("c", 3.0))
  }

  test("streaming update mode: the top-K view is maintained across batches") {
    // the aggregator's reason to exist — a sort-limit leaderboard must
    // recompute from all state each micro-batch, the k-bounded buffer
    // merges incrementally
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val out = in.toDF().toDF("member", "score")
      .agg(TopKAggregator.topK(2)(col("member"), col("score")).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e._1").as("member"), col("e._2").as("score"))
    val q = out.writeStream.format("memory").queryName("topk")
      .outputMode("complete").start()
    in.addData(("a", 1.0), ("b", 5.0), ("c", 3.0))
    q.processAllAvailable()
    val batch1 = spark.table("topk").as[(String, Double)].collect().toSeq
    in.addData(("d", 9.0)) // displaces c from the top 2
    q.processAllAvailable()
    val batch2 = spark.table("topk").as[(String, Double)].collect().toSeq
    q.stop()
    batch1 shouldBe Seq(("b", 5.0), ("c", 3.0))
    batch2 shouldBe Seq(("d", 9.0), ("b", 5.0))
  }
}
