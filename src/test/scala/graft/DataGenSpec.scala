package graft

import org.apache.spark.sql.functions._

import graft.operators.DataGen

/** Generated distributions must match the reference generator's
  * specification (SURVEY.md §2.8): weights, conditional duration
  * bounds, null paths. */
class DataGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gen = DataGen.events(
    spark.range(20000).toDF("id"), "id").persist()

  test("G1 weights: play/pause/click/finish ≈ 45/25/20/10") {
    val w = gen.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / 20000).toMap
    w("play") shouldBe 0.45 +- 0.02
    w("pause") shouldBe 0.25 +- 0.02
    w("click") shouldBe 0.20 +- 0.02
    w("finish") shouldBe 0.10 +- 0.02
  }

  test("G2 bounds: duration windows per type; click is always null") {
    gen.filter(col("event_type") === "click" && col("duration_ms").isNotNull)
      .count() shouldBe 0
    val bad = gen.filter(col("event_type") =!= "click").withColumn(
      "permille", col("duration_ms") / col("length_seconds"))
      .filter(
        (col("event_type") === "play" && !col("permille").between(50, 950)) ||
        (col("event_type") === "pause" && !col("permille").between(100, 800)) ||
        (col("event_type") === "finish" && !col("permille").between(850, 1000)))
    bad.count() shouldBe 0
  }

  test("G3/G5: device null quirk ≈ 1/7; payload parses as JSON per type") {
    val nullFrac = gen.filter(col("device").isNull).count().toDouble / 20000
    nullFrac shouldBe (1.0 / 7.0) +- 0.02
    // every payload is valid JSON with the per-type extras
    val parsed = gen.withColumn("x", get_json_object(col("raw_payload"), "$.session_id"))
    parsed.filter(col("x").isNull).count() shouldBe 0
    gen.filter(col("event_type") === "click" &&
      get_json_object(col("raw_payload"), "$.coordinates.x").isNull)
      .count() shouldBe 0
  }

  test("generation is deterministic and partition-independent") {
    val a = gen.orderBy("gen_id").collect()
    val b = DataGen.events(spark.range(20000).repartition(13).toDF("id"), "id")
      .orderBy("gen_id").collect()
    a shouldBe b
  }
}
