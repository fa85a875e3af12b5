package graft

import org.apache.spark.sql.functions._

import graft.ingest.Tables

/** Bucketing — the co-located-join lever at 100 TB: both sides written
  * bucketed on the join key join WITHOUT any shuffle exchange (the
  * repeated-join amortization that broadcast can't give when both sides
  * are large). */
class BucketingSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("bucketed tables join with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables.orders(spark, d).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      Tables.customer(spark, d).write
        .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString

      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning" // co-located: no shuffle
      plan should include("Bucketed: true")

      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.orders(spark, d).join(
        Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey")).count()
      n shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
